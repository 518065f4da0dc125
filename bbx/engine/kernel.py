"""Batched, pure-functional board kernels.

Everything here operates on a *batch* of boards — shape ``[N, 8, 8]`` uint8 —
with no Python-level control flow, so the whole game step fuses into one XLA
program.  Semantics mirror the reference NumPy `Board`
(`/root/reference/src/game/board.py`), re-derived as tensor ops:

  * placement validity   (`board.py:71-93`)   -> one matmul vs. OCC_T
  * line clearing        (`board.py:144-193`) -> axis reductions + mask
  * hole counting        (`board.py:195-234`) -> shifted-neighbor logic
  * center openness      (`board.py:236-243`) -> static slice reduction
  * height map/bumpiness (`board.py:245-267`) -> argmax over rows
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from .tables import (
    ANCHOR_OK,
    BOARD_SIZE,
    NUM_CELLS,
    OCC_T_BF16,
    PIECES_PER_TURN,
    PLACEMENT,
)


def empty_boards(n: int) -> jnp.ndarray:
    """A batch of empty 8x8 boards."""
    return jnp.zeros((n, BOARD_SIZE, BOARD_SIZE), dtype=jnp.uint8)


def valid_anchors_all_pieces(board: jnp.ndarray) -> jnp.ndarray:
    """Validity of every (piece, anchor) pair on every board.

    Args:
      board: [N, 8, 8] uint8 (0/1).
    Returns:
      [N, 37, 64] bool — True where the piece fits in-bounds with no overlap.

    This is the TPU replacement for the reference's nested per-cell scans
    (`engine.py:364-380`): a single [N,64] x [64, 37*64] bf16 matmul counts
    overlapping cells for all 2368 (piece, anchor) pairs at once.  (The
    production step/observe path derives masks for just the three drawn
    pieces from bitboards — `bbx.engine.solvability.valid3_bits`; this
    all-pieces form serves the 37-piece GUI/analysis surface and the
    differential tests.)
    """
    n = board.shape[0]
    flat = board.reshape(n, NUM_CELLS).astype(jnp.bfloat16)
    overlap = jax.lax.dot_general(
        flat,
        OCC_T_BF16,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, 2368]
    no_overlap = overlap.reshape(n, -1, NUM_CELLS) < 0.5
    return ANCHOR_OK[None] & no_overlap


def valid_anchors_for(board: jnp.ndarray, piece_ids: jnp.ndarray) -> jnp.ndarray:
    """Validity for a specific set of pieces per board.

    Args:
      board: [N, 8, 8] uint8.
      piece_ids: [N, K] int32.
    Returns:
      [N, K, 64] bool.
    """
    all_valid = valid_anchors_all_pieces(board)
    return jnp.take_along_axis(all_valid, piece_ids[:, :, None], axis=1)


def gather_piece_validity(
    all_valid: jnp.ndarray, piece_ids: jnp.ndarray
) -> jnp.ndarray:
    """Select rows of a precomputed [N, 37, 64] validity tensor."""
    return jnp.take_along_axis(all_valid, piece_ids[:, :, None], axis=1)


def place(board: jnp.ndarray, piece_id: jnp.ndarray, anchor: jnp.ndarray) -> jnp.ndarray:
    """Stamp piece occupancy onto each board (no validity check).

    Args:
      board: [N, 8, 8] uint8.
      piece_id: [N] int32.
      anchor: [N] int32 flat cell index (row * 8 + col).
    Returns:
      [N, 8, 8] uint8 with the piece cells set.
    """
    occ = PLACEMENT[piece_id, anchor]  # [N, 64] bool
    return board | occ.reshape(board.shape).astype(jnp.uint8)


def clear_lines(board: jnp.ndarray):
    """Clear all complete rows and columns.

    Matches `board.py:144-193`: full rows and full columns found on the same
    snapshot, then zeroed together (intersections counted once by the caller's
    scoring, which uses `lines * 8` anyway — `engine.py:427`).

    Args:
      board: [N, 8, 8] uint8.
    Returns:
      (new_board [N,8,8] uint8, rows_cleared [N] i32, cols_cleared [N] i32)
    """
    filled = board > 0
    rows_full = jnp.all(filled, axis=2)  # [N, 8]
    cols_full = jnp.all(filled, axis=1)  # [N, 8]
    keep = ~(rows_full[:, :, None] | cols_full[:, None, :])
    new_board = jnp.where(keep, board, 0).astype(jnp.uint8)
    return (
        new_board,
        jnp.sum(rows_full, axis=1).astype(jnp.int32),
        jnp.sum(cols_full, axis=1).astype(jnp.int32),
    )


def clear_lines_flat(flat: jnp.ndarray) -> jnp.ndarray:
    """Line-clear on flat boards of any leading shape ([..., 64] -> [..., 64]).

    Used by the solvability search, which simulates clears between virtual
    placements (`engine.py:226-238`).
    """
    lead = flat.shape[:-1]
    g = (flat > 0).reshape(*lead, BOARD_SIZE, BOARD_SIZE)
    rows_full = jnp.all(g, axis=-1)
    cols_full = jnp.all(g, axis=-2)
    keep = ~(rows_full[..., :, None] | cols_full[..., None, :])
    return (g & keep).reshape(*lead, NUM_CELLS).astype(flat.dtype)


def count_holes(board: jnp.ndarray) -> jnp.ndarray:
    """Count empty cells whose 4 orthogonal neighbors are filled or off-board.

    Matches `board.py:195-216`.  Returns [N] int32.
    """
    filled = board > 0
    padded = jnp.pad(filled, ((0, 0), (1, 1), (1, 1)), constant_values=True)
    up = padded[:, :-2, 1:-1]
    down = padded[:, 2:, 1:-1]
    left = padded[:, 1:-1, :-2]
    right = padded[:, 1:-1, 2:]
    holes = (~filled) & up & down & left & right
    return jnp.sum(holes, axis=(1, 2)).astype(jnp.int32)


def count_potential_holes(board: jnp.ndarray) -> jnp.ndarray:
    """Empty cells with >= 3 blocked orthogonal neighbors (`board.py:218-234`)."""
    filled = board > 0
    padded = jnp.pad(filled, ((0, 0), (1, 1), (1, 1)), constant_values=True)
    blocked = (
        padded[:, :-2, 1:-1].astype(jnp.int32)
        + padded[:, 2:, 1:-1]
        + padded[:, 1:-1, :-2]
        + padded[:, 1:-1, 2:]
    )
    return jnp.sum((~filled) & (blocked >= 3), axis=(1, 2)).astype(jnp.int32)


def center_openness(board: jnp.ndarray) -> jnp.ndarray:
    """1 - fill fraction of the inner 4x4 (`board.py:236-243`). Returns [N] f32."""
    center = board[:, 2:6, 2:6].astype(jnp.float32)
    return 1.0 - jnp.sum(center, axis=(1, 2)) / 16.0


def height_map(board: jnp.ndarray) -> jnp.ndarray:
    """Per-column height: 8 - topmost filled row, 0 if empty (`board.py:245-256`).

    Returns [N, 8] int32.
    """
    filled = board > 0
    row_idx = jnp.arange(BOARD_SIZE, dtype=jnp.int32)[None, :, None]
    # For each column, the smallest filled row index (BOARD_SIZE if none).
    top = jnp.min(jnp.where(filled, row_idx, BOARD_SIZE), axis=1)
    return jnp.where(top < BOARD_SIZE, BOARD_SIZE - top, 0).astype(jnp.int32)


def bumpiness(board: jnp.ndarray) -> jnp.ndarray:
    """Sum of |height[i] - height[i+1]| (`board.py:258-267`). Returns [N] i32."""
    h = height_map(board)
    return jnp.sum(jnp.abs(h[:, 1:] - h[:, :-1]), axis=1).astype(jnp.int32)


def total_blocks(board: jnp.ndarray) -> jnp.ndarray:
    """Number of filled cells per board. Returns [N] int32."""
    return jnp.sum(board > 0, axis=(1, 2)).astype(jnp.int32)


def action_mask(
    all_valid: jnp.ndarray, piece_ids: jnp.ndarray, used: jnp.ndarray
) -> jnp.ndarray:
    """Per-slot action mask.

    Args:
      all_valid: [N, 37, 64] from `valid_anchors_all_pieces`.
      piece_ids: [N, 3] int32 current piece ids.
      used: [N, 3] bool.
    Returns:
      [N, 3, 64] bool — matches `engine.get_action_mask` (`engine.py:364-380`).
    """
    v = gather_piece_validity(all_valid, piece_ids)
    return v & ~used[:, :, None]


def decode_action(action: jnp.ndarray):
    """Flat action -> (slot, anchor); action = slot*64 + row*8 + col
    (`block_blast_env.py:104-118`)."""
    slot = action // NUM_CELLS
    anchor = action % NUM_CELLS
    return slot, anchor


def encode_action(slot, row, col):
    """(slot, row, col) -> flat action (`block_blast_env.py:120-132`)."""
    return slot * NUM_CELLS + row * BOARD_SIZE + col
