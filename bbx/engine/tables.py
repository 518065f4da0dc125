"""Device-resident constant tables derived from the piece catalogue.

These are the JAX-side views of the NumPy tables in `bbx.engine.pieces`.
They are module-level constants: under `jit` they are embedded once and live
in HBM; XLA folds them into the fused step computation.

Key tensors:
  * ``OCC_T`` [64, 37*64] — transposed flat occupancy.  ``board @ OCC_T``
    yields, for every (piece, anchor) pair at once, the number of overlapping
    cells: the entire "can this piece go here" scan of the reference
    (`board.py:71-93`, `engine.py:364-380`) becomes a single MXU matmul.
  * ``PAIR_CONFLICT`` [37, 37, 64, 64] — whether two anchored pieces share a
    cell; powers the disjoint-placement solvability fast path.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import pieces as P

BOARD_SIZE = P.BOARD_SIZE
NUM_CELLS = P.NUM_CELLS
PIECES_PER_TURN = P.PIECES_PER_TURN
NUM_ACTIONS = P.NUM_ACTIONS
NUM_PIECE_TYPES = P.NUM_PIECE_TYPES

# Core geometry tables.
PIECE_MASKS = jnp.asarray(P.PIECE_MASKS)                    # [37, 8, 8] f32
PIECE_NBLOCKS = jnp.asarray(P.PIECE_NBLOCKS)                # [37] i32
ANCHOR_OK = jnp.asarray(P.ANCHOR_OK)                        # [37, 64] bool
PLACEMENT = jnp.asarray(P.PLACEMENT)                        # [37, 64, 64] bool
PAIR_CONFLICT = jnp.asarray(P.PAIR_CONFLICT)                # [37, 37, 64, 64] bool

# Occupancy reshaped for the all-pieces overlap matmul.  bfloat16 keeps the
# contraction on the MXU; overlap counts are <= 9 so bf16 is exact.
OCC_FLAT = PLACEMENT.reshape(NUM_PIECE_TYPES * NUM_CELLS, NUM_CELLS)
OCC_T_BF16 = OCC_FLAT.astype(jnp.bfloat16).T               # [64, 2368]
PLACEMENT_BF16 = PLACEMENT.astype(jnp.bfloat16)             # [37, 64, 64]

# Inverted conflict in bf16 for the fast-path matmul.
NO_CONFLICT_BF16 = (~P.PAIR_CONFLICT).astype("float32")
NO_CONFLICT_BF16 = jnp.asarray(NO_CONFLICT_BF16, dtype=jnp.bfloat16)

# Bit-packed geometry for the bitboard solvability kernels: a board is two
# u32 words (cell i -> word i//32, bit i%32), so per-anchor overlap tests
# are two ANDs instead of a 64-cell contraction.
PLACE_BITS = jnp.asarray(P.PLACE_BITS)                      # [37, 64, 2] u32
NO_CONFLICT_BITS = jnp.asarray(P.NO_CONFLICT_BITS)          # [37,37,64,2] u32
PIECE_SHIFTS = jnp.asarray(P.PIECE_SHIFTS, dtype=jnp.uint32)  # [37, 9] u32
ANCHOR_OK_BITS = jnp.asarray(P.ANCHOR_OK_BITS)              # [37, 2] u32
MAX_PIECE_CELLS = P.MAX_PIECE_CELLS

# Per-line cell counts of each anchored piece: placing piece p at anchor a on
# a board it does not overlap completes row r iff
# ``rowsum[r] + ROW_COUNT[p, a, r] == 8`` (and likewise for columns).  These
# power the clear-prediction screens in `bbx.engine.solvability` without
# simulating a single placement.
_PL_GRID = P.PLACEMENT.reshape(
    NUM_PIECE_TYPES, NUM_CELLS, BOARD_SIZE, BOARD_SIZE
)
ROW_COUNT = jnp.asarray(_PL_GRID.sum(axis=3), dtype=jnp.int32)  # [37, 64, 8]
COL_COUNT = jnp.asarray(_PL_GRID.sum(axis=2), dtype=jnp.int32)  # [37, 64, 8]
del _PL_GRID
