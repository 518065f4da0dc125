"""Piece catalogue for Block Blast.

The game uses 37 fixed shapes, each a set of (row, col) cell offsets
normalized so the bounding box's top-left corner sits at (0, 0).  The
catalogue (names, offsets, and registry order) matches the reference
implementation (`/root/reference/src/game/pieces.py:78-318`) because piece
*identity and index order* are observable game facts: the policy network's
inputs and the RNG piece draws are indexed by this order.

Unlike the reference — which stores pieces as Python dataclasses and loops
over offsets at runtime — everything here is compiled once, at import, into
dense NumPy tables that the TPU kernels consume as constants (see
`bbx.engine.tables`).
"""
from __future__ import annotations

import numpy as np

BOARD_SIZE = 8
NUM_CELLS = BOARD_SIZE * BOARD_SIZE
PIECES_PER_TURN = 3
NUM_ACTIONS = PIECES_PER_TURN * NUM_CELLS  # 192

# Shapes drawn as ASCII art: '#' = block, '.' = empty, rows separated by '/'.
# Registry order is load-bearing (piece index = position in this dict); it
# mirrors the reference registry (`pieces.py:244-313`).
_ART: dict[str, str] = {
    # Single (1)
    "SINGLE": "#",
    # Dominoes (2)
    "DOMINO_H": "##",
    "DOMINO_V": "#/#",
    # Diagonal 2-block (2)
    "DIAG2_TL_BR": "#./.#",
    "DIAG2_TR_BL": ".#/#.",
    # Straight trominoes (2)
    "TRIO_H": "###",
    "TRIO_V": "#/#/#",
    # Diagonal 3-block (2)
    "DIAG3_TL_BR": "#../.#./..#",
    "DIAG3_TR_BL": "..#/.#./#..",
    # L-trominoes (4)
    "TRIO_L1": "#./##",
    "TRIO_L2": "##/.#",
    "TRIO_L3": "##/#.",
    "TRIO_L4": ".#/##",
    # I4 (2)
    "I_H": "####",
    "I_V": "#/#/#/#",
    # I5 (2)
    "I5_H": "#####",
    "I5_V": "#/#/#/#/#",
    # O (1)
    "O": "##/##",
    # T (4)
    "T_UP": ".#./###",
    "T_DOWN": "###/.#.",
    "T_LEFT": "#./##/#.",
    "T_RIGHT": ".#/##/.#",
    # S (2)
    "S_H": ".##/##.",
    "S_V": "#./##/.#",
    # Z (2)
    "Z_H": "##./.##",
    "Z_V": ".#/##/#.",
    # L (4)
    "L_1": "#./#./##",
    "L_2": "###/#..",
    "L_3": "##/.#/.#",
    "L_4": "..#/###",
    # J (4)
    "J_1": ".#/.#/##",
    "J_2": "#../###",
    "J_3": "##/#./#.",
    "J_4": "###/..#",
    # 2x3 rectangles (2)
    "RECT_2x3_H": "###/###",
    "RECT_2x3_V": "##/##/##",
    # 3x3 square (1)
    "SQUARE_3x3": "###/###/###",
}


def _parse(art: str) -> tuple[tuple[int, int], ...]:
    rows = art.split("/")
    return tuple(
        (r, c)
        for r, line in enumerate(rows)
        for c, ch in enumerate(line)
        if ch == "#"
    )


PIECE_NAMES: list[str] = list(_ART.keys())
PIECE_OFFSETS: list[tuple[tuple[int, int], ...]] = [_parse(a) for a in _ART.values()]
NUM_PIECE_TYPES = len(PIECE_NAMES)
assert NUM_PIECE_TYPES == 37, f"expected 37 piece types, got {NUM_PIECE_TYPES}"

NAME_TO_INDEX: dict[str, int] = {n: i for i, n in enumerate(PIECE_NAMES)}


def _build_static_tables():
    """Build the dense per-piece tables (NumPy, computed once at import)."""
    n = NUM_PIECE_TYPES
    heights = np.zeros(n, dtype=np.int32)
    widths = np.zeros(n, dtype=np.int32)
    nblocks = np.zeros(n, dtype=np.int32)
    masks = np.zeros((n, BOARD_SIZE, BOARD_SIZE), dtype=np.float32)
    for i, offs in enumerate(PIECE_OFFSETS):
        rs = [r for r, _ in offs]
        cs = [c for _, c in offs]
        heights[i] = max(rs) + 1
        widths[i] = max(cs) + 1
        nblocks[i] = len(offs)
        for r, c in offs:
            masks[i, r, c] = 1.0

    # anchor_ok[p, a]: piece p fits in-bounds when its top-left anchor is at
    # cell a = r * 8 + c  (reference scans `board.py:117-142`).
    anchor_ok = np.zeros((n, NUM_CELLS), dtype=bool)
    # placement[p, a, cell]: occupancy of piece p anchored at a over the flat
    # board; all-zero rows for out-of-bounds anchors.
    placement = np.zeros((n, NUM_CELLS, NUM_CELLS), dtype=bool)
    for p, offs in enumerate(PIECE_OFFSETS):
        for r in range(BOARD_SIZE - heights[p] + 1):
            for c in range(BOARD_SIZE - widths[p] + 1):
                a = r * BOARD_SIZE + c
                anchor_ok[p, a] = True
                for dr, dc in offs:
                    placement[p, a, (r + dr) * BOARD_SIZE + (c + dc)] = True

    # pair_conflict[p, q, a, b]: do (p anchored at a) and (q anchored at b)
    # share a cell?  One 2368x2368 boolean Gram matrix, ~5.6 MB. Used by the
    # disjoint-placement solvability fast path (see bbx.engine.solvability).
    occ = placement.reshape(n * NUM_CELLS, NUM_CELLS).astype(np.int32)
    gram = occ @ occ.T
    pair_conflict = (gram > 0).reshape(n, NUM_CELLS, n, NUM_CELLS)
    pair_conflict = np.ascontiguousarray(pair_conflict.transpose(0, 2, 1, 3))

    return {
        "heights": heights,
        "widths": widths,
        "nblocks": nblocks,
        "masks": masks,
        "anchor_ok": anchor_ok,
        "placement": placement,
        "pair_conflict": pair_conflict,
    }


_T = _build_static_tables()
PIECE_HEIGHTS: np.ndarray = _T["heights"]            # [37] int32
PIECE_WIDTHS: np.ndarray = _T["widths"]              # [37] int32
PIECE_NBLOCKS: np.ndarray = _T["nblocks"]            # [37] int32
PIECE_MASKS: np.ndarray = _T["masks"]                # [37, 8, 8] float32
ANCHOR_OK: np.ndarray = _T["anchor_ok"]              # [37, 64] bool
PLACEMENT: np.ndarray = _T["placement"]              # [37, 64, 64] bool
PAIR_CONFLICT: np.ndarray = _T["pair_conflict"]      # [37, 37, 64, 64] bool
del _T


def _pack_bits(flat: np.ndarray) -> np.ndarray:
    """Pack a trailing [64]-cell axis into [2] uint32 words (cell i -> word
    i // 32, bit i % 32).  The bitboard encoding used by the solvability
    kernels: one 8x8 board is 64 bits, so overlap tests and line clears
    become a couple of u32 ops instead of 64-element reductions."""
    b = flat.astype(np.uint32).reshape(*flat.shape[:-1], 2, 32)
    return (b << np.arange(32, dtype=np.uint32)).sum(
        axis=-1, dtype=np.uint32
    )


# Bit-packed occupancy of each anchored piece: [37, 64 anchors, 2] uint32.
PLACE_BITS: np.ndarray = _pack_bits(PLACEMENT)

# NO_CONFLICT_BITS[p, q, a]: bitmask over anchors b of q that are in-bounds
# and whose placement shares no cell with p@a — the bit-packed complement of
# PAIR_CONFLICT, [37, 37, 64 anchors-of-p, 2] uint32 (~700 KB).
NO_CONFLICT_BITS: np.ndarray = _pack_bits(
    (~PAIR_CONFLICT) & ANCHOR_OK[None, :, None, :]
)

# PIECE_SHIFTS[p, o]: bit shift of the o-th cell offset of piece p over the
# row-major bitboard (cell (dr, dc) -> 8*dr + dc), padded to 9 slots by
# repeating the first offset (a duplicate OR term is harmless).  Powers the
# shift-OR valid-anchor kernel: anchor a of piece p overlaps the board iff
# some piece cell (a + shift) is occupied, so the full 64-anchor validity
# bitmask is ANCHOR_OK & ~OR_o(board >> shift_o) — <= 9 shift-ORs on two u32
# words instead of 64 per-anchor AND tests (out-of-bounds anchors would read
# row-wrapped bits, but ANCHOR_OK zeroes exactly those anchors).
MAX_PIECE_CELLS = 9
PIECE_SHIFTS: np.ndarray = np.array(
    [
        [
            BOARD_SIZE * offs[o % len(offs)][0] + offs[o % len(offs)][1]
            for o in range(MAX_PIECE_CELLS)
        ]
        for offs in PIECE_OFFSETS
    ],
    dtype=np.int32,
)

# Bit-packed ANCHOR_OK: [37, 2] uint32.
ANCHOR_OK_BITS: np.ndarray = _pack_bits(ANCHOR_OK)


def piece_mask(index: int, board_size: int = BOARD_SIZE) -> np.ndarray:
    """Render piece `index` at the origin of a board-sized grid."""
    if board_size == BOARD_SIZE:
        return PIECE_MASKS[index].copy()
    m = np.zeros((board_size, board_size), dtype=np.float32)
    for r, c in PIECE_OFFSETS[index]:
        if r < board_size and c < board_size:
            m[r, c] = 1.0
    return m


def piece_shape_array(index: int) -> np.ndarray:
    """Minimal bounding-box int8 array of the piece."""
    h, w = int(PIECE_HEIGHTS[index]), int(PIECE_WIDTHS[index])
    arr = np.zeros((h, w), dtype=np.int8)
    for r, c in PIECE_OFFSETS[index]:
        arr[r, c] = 1
    return arr


def piece_one_hot(index: int) -> np.ndarray:
    v = np.zeros(NUM_PIECE_TYPES, dtype=np.float32)
    v[index] = 1.0
    return v


def visualize_piece(index: int) -> str:
    arr = piece_shape_array(index)
    return "\n".join("".join("□" if c else " " for c in row) for row in arr)
