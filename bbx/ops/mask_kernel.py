"""Pallas TPU kernel: fused placement-validity computation.

Computes, for a batch of boards, the validity of every (piece, anchor) pair —
the tensor the whole engine runs on (`bbx.engine.kernel.
valid_anchors_all_pieces`).  The XLA path materializes a [N, 2368] f32
overlap-count intermediate in HBM; this kernel fuses the bf16 matmul with the
`< 0.5` threshold and the in-bounds AND on-chip:

  HBM traffic per tile:  board [TN, 64] bf16 in, validity [TN, 2368] int8 out
  VMEM residents:        occupancy table [64, 2368] bf16 (~300 KB)
  MXU work:              [TN, 64] x [64, 2368] per tile

Used on TPU when `BBX_PALLAS=1` (see `bbx.engine.kernel`); the XLA fallback
stays the default and is bit-identical (tests compare both paths in
interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..engine import pieces as P

TILE_N = 256


@functools.cache
def _tables():
    occ = jnp.asarray(P.PLACEMENT.reshape(37 * 64, 64).T,
                      dtype=jnp.bfloat16)        # [64, 2368]
    anchor_ok = jnp.asarray(
        P.ANCHOR_OK.reshape(1, 37 * 64).astype("int8"))  # [1, 2368]
    return occ, anchor_ok


def _mask_kernel(board_ref, occ_ref, anchor_ok_ref, out_ref):
    overlap = jnp.dot(
        board_ref[:], occ_ref[:], preferred_element_type=jnp.float32
    )  # [TILE_N, 2368]
    valid = (overlap < 0.5).astype(jnp.int8) * anchor_ok_ref[:]
    out_ref[:] = valid


def valid_anchors_all_pieces_pallas(
    board: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """[N, 8, 8] uint8 -> [N, 37, 64] bool, Pallas-fused.

    N must be a multiple of TILE_N (the engine's batch sizes are powers of
    two >= 256 at TPU scale); smaller batches should use the XLA path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = board.shape[0]
    assert n % TILE_N == 0, f"batch {n} not a multiple of {TILE_N}"
    occ, anchor_ok = _tables()
    flat = board.reshape(n, 64).astype(jnp.bfloat16)

    out = pl.pallas_call(
        _mask_kernel,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, 64), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 37 * 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 37 * 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, 37 * 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 37 * 64), jnp.int8),
        interpret=interpret,
    )(flat, occ, anchor_ok)
    return out.reshape(n, 37, 64).astype(bool)
