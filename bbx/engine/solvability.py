"""Piece-triple solvability: can all 3 drawn pieces be placed in some order?

The reference regenerates a piece triple until a recursive search proves all
three can be placed sequentially, simulating line clears between placements
(`/root/reference/src/game/engine.py:155-238`).  Data-dependent recursion is
the worst fit for XLA, so this module computes the *same boolean* with
fixed-shape tensor algebra:

1.  **Fast path — disjoint placements (sufficient).**  If the three pieces
    admit pairwise non-overlapping valid placements on the current board,
    then any placement order succeeds: line clears only *empty* cells, so a
    placement that was valid on the original board stays valid
    (`solvable_disjoint_bits`).

2.  **Exact path — exhaustive bitboard search with simulated clears**
    (`solvable_exact_bits`): every ordered pair of first/second anchors
    with clears applied between placements, third piece fits-anywhere.
    Runs over demand-compacted buffers (see `bbx.engine.state`).

`fast OR exact` is exactly the reference predicate.  The dense (unpacked)
formulations `solvable_disjoint` and `solvable_full` are kept as
differential-test oracles for the bitboard kernels; they are not on the
production path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernel import clear_lines_flat
from .tables import (
    ANCHOR_OK,
    ANCHOR_OK_BITS,
    MAX_PIECE_CELLS,
    NO_CONFLICT_BF16,
    NO_CONFLICT_BITS,
    NUM_CELLS,
    PAIR_CONFLICT,
    PIECE_SHIFTS,
    PIECES_PER_TURN,
    PLACE_BITS,
    PLACEMENT,
    PLACEMENT_BF16,
)

_F32 = jnp.float32
_BF16 = jnp.bfloat16


# ---------------------------------------------------------------------------
# Bitboard kernels.
#
# The verdict tiers are HBM-bound in their gathered per-lane geometry: the
# bf16/f32 formulations move [64, 64] conflict planes (8-16 KB per lane and
# combo) through gathers and VPU multiply-reduce fusions.  On a bitboard —
# one 8x8 board = 64 bits = [2] uint32 — the same tests are a couple of u32
# ANDs against [64, 2] packed tables (0.5 KB), a ~16x traffic cut measured
# on the TPU op trace.  These kernels are the production regen path; the
# dense versions below remain as the differential-testing oracle.
# ---------------------------------------------------------------------------

_U1 = jnp.uint32(1)
_BYTE = jnp.uint32(0xFF)


def pack_cells(flat: jnp.ndarray) -> jnp.ndarray:
    """Pack a trailing [64] bool/int axis into [2] uint32 bitboard words."""
    b = (flat != 0).astype(jnp.uint32).reshape(*flat.shape[:-1], 2, 32)
    return jnp.sum(
        b << jnp.arange(32, dtype=jnp.uint32), axis=-1, dtype=jnp.uint32
    )


def unpack_cells(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] uint32 -> [..., 64] bool."""
    u = (bits[..., :, None] >> jnp.arange(32, dtype=jnp.uint32)) & _U1
    return u.reshape(*bits.shape[:-1], NUM_CELLS).astype(bool)


def board_bits(board: jnp.ndarray) -> jnp.ndarray:
    """[N, 8, 8] uint8 -> [N, 2] uint32 bitboards."""
    return pack_cells(board.reshape(*board.shape[:-2], NUM_CELLS))


def clear_lines_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Zero all complete rows and columns of packed boards ([..., 2] u32).

    Word 0 holds rows 0-3 (row r = byte r), word 1 rows 4-7; column c is
    bit c of every byte.  A full row is an all-ones byte; a full column has
    bit c set in all eight bytes (AND-fold each word by 8/16, then across
    words).  Same snapshot semantics as `clear_lines` (`board.py:144-193`).
    """
    b0, b1 = bits[..., 0], bits[..., 1]

    def rowmask(b):
        m = jnp.zeros_like(b)
        for k in range(4):
            full = ((b >> (8 * k)) & _BYTE) == _BYTE
            m = m | jnp.where(full, jnp.uint32(0xFF << (8 * k)),
                              jnp.uint32(0))
        return m

    def colbits(b):
        cm = b & (b >> 8)
        cm = cm & (cm >> 16)
        return cm & _BYTE

    colmask = (colbits(b0) & colbits(b1)) * jnp.uint32(0x01010101)
    return jnp.stack(
        [b0 & ~(rowmask(b0) | colmask), b1 & ~(rowmask(b1) | colmask)],
        axis=-1,
    )


def _shr64(b0: jnp.ndarray, b1: jnp.ndarray, s: jnp.ndarray):
    """Logical right shift of a 64-bit board held as two u32 words.

    ``s`` (uint32, any shape broadcastable to the words) may range over
    [0, 63].  Shift amounts are kept strictly below 32 on every lowered op
    (XLA leaves out-of-range shifts undefined): the carry term uses
    ``(32 - s) & 31`` and is masked off where s == 0.
    """
    big = s >= 32
    sm = jnp.where(big, s - 32, s)                   # in [0, 31]
    carry = jnp.where(
        sm > 0, b1 << ((jnp.uint32(32) - sm) & jnp.uint32(31)), jnp.uint32(0)
    )
    r0 = jnp.where(big, b1 >> sm, (b0 >> sm) | carry)
    r1 = jnp.where(big, jnp.uint32(0), b1 >> sm)
    return r0, r1


def piece_fit_words(b0: jnp.ndarray, b1: jnp.ndarray, piece_id: jnp.ndarray):
    """Valid-anchor bitmask of one piece per board, by shift-OR dilation.

    Anchor a of piece p collides with the board iff some piece cell
    (a + shift_o) is occupied, so the full 64-anchor validity bitmask is
    ``ANCHOR_OK_BITS[p] & ~OR_o(board >> PIECE_SHIFTS[p, o])`` — at most 9
    shift-ORs on two u32 words instead of 64 per-anchor AND tests against
    gathered [64, 2] placement tables.  Row-wrapped reads at out-of-bounds
    anchors are zeroed by ANCHOR_OK.  Same verdict as the reference's
    per-anchor `can_place` scan (`/root/reference/src/game/board.py:71-93`).

    Args:
      b0, b1: board words, shape ``piece_id.shape + extra``.
      piece_id: int32, a prefix of the boards' shape.
    Returns:
      (f0, f1) valid-anchor words, same shape as b0/b1.
    """
    sh = PIECE_SHIFTS[piece_id]                      # [*pid, 9] u32
    aok = ANCHOR_OK_BITS[piece_id]                   # [*pid, 2] u32
    extra = (1,) * (b0.ndim - piece_id.ndim)
    shape = piece_id.shape + extra
    m0 = jnp.zeros_like(b0)
    m1 = jnp.zeros_like(b1)
    for o in range(MAX_PIECE_CELLS):
        r0, r1 = _shr64(b0, b1, sh[..., o].reshape(shape))
        m0 = m0 | r0
        m1 = m1 | r1
    return aok[..., 0].reshape(shape) & ~m0, aok[..., 1].reshape(shape) & ~m1


def valid3_bits(bits: jnp.ndarray, piece_ids: jnp.ndarray) -> jnp.ndarray:
    """Validity of each drawn piece at every anchor, from bitboards.

    Args:
      bits: [K, 2] uint32.
      piece_ids: [K, 3] int32.
    Returns:
      [K, 3, 64] bool — equals `gather_piece_validity(valid_anchors_all_
      pieces(board), ids)` on the matching dense board.
    """
    k = piece_ids.shape[0]
    b0 = jnp.broadcast_to(bits[:, None, 0], (k, PIECES_PER_TURN))
    b1 = jnp.broadcast_to(bits[:, None, 1], (k, PIECES_PER_TURN))
    f0, f1 = piece_fit_words(b0, b1, piece_ids)
    return unpack_cells(jnp.stack([f0, f1], axis=-1))


def solvable_disjoint_bits(
    bits: jnp.ndarray, piece_ids: jnp.ndarray, valid3: jnp.ndarray
) -> jnp.ndarray:
    """Bitboard form of `solvable_disjoint` (same verdict).

    Args:
      bits: [K, 2] uint32 boards.
      piece_ids: [K, 3] int32.
      valid3: [K, 3, 64] bool from `valid3_bits`.
    Returns:
      [K] bool.
    """
    p0, p1, p2 = piece_ids[:, 0], piece_ids[:, 1], piece_ids[:, 2]
    v1b = pack_cells(valid3[:, 1])                    # [K, 2] over a1
    v2b = pack_cells(valid3[:, 2])                    # [K, 2] over a2
    nc01 = NO_CONFLICT_BITS[p0, p1]                   # [K, 64a0, 2] over a1
    nc02 = NO_CONFLICT_BITS[p0, p2]                   # [K, 64a0, 2] over a2
    nc12 = NO_CONFLICT_BITS[p1, p2]                   # [K, 64a1, 2] over a2

    # Anchors of p1 valid and disjoint from p0@a0, per a0.
    m01 = unpack_cells(nc01 & v1b[:, None, :])        # [K, 64a0, 64a1]
    # t[a0] = union over those a1 of p2-anchors disjoint from p1@a1
    # (boolean matrix product as a fused AND + OR-reduce over a1).
    contrib = jnp.where(
        m01[..., None], nc12[:, None, :, :], jnp.uint32(0)
    )                                                 # [K, 64a0, 64a1, 2]
    t = jax.lax.reduce(
        contrib, jnp.uint32(0), jax.lax.bitwise_or, (2,)
    )                                                 # [K, 64a0, 2]
    final = t & nc02 & v2b[:, None, :]
    hit = (final[..., 0] | final[..., 1]) != 0        # [K, 64a0]
    return jnp.any(valid3[:, 0] & hit, axis=1)


def _clear_lines_words(b0: jnp.ndarray, b1: jnp.ndarray):
    """`clear_lines_bits` on the two board words as separate arrays (any
    matching shape) — avoids a trailing [2] axis, which lowers to strided
    per-word slices on TPU."""
    def rowmask(b):
        m = jnp.zeros_like(b)
        for k in range(4):
            full = ((b >> (8 * k)) & _BYTE) == _BYTE
            m = m | jnp.where(full, jnp.uint32(0xFF << (8 * k)),
                              jnp.uint32(0))
        return m

    def colbits(b):
        cm = b & (b >> 8)
        cm = cm & (cm >> 16)
        return cm & _BYTE

    colmask = (colbits(b0) & colbits(b1)) * jnp.uint32(0x01010101)
    return b0 & ~(rowmask(b0) | colmask), b1 & ~(rowmask(b1) | colmask)


def solvable_exact_bits(
    bits: jnp.ndarray, piece_ids: jnp.ndarray, valid3: jnp.ndarray
) -> jnp.ndarray:
    """Exact solvability by exhaustive bitboard search (all 6 orders, all
    anchor pairs, line clears simulated between placements).

    The whole enumeration is a fused elementwise chain over [K, a1, a2]
    board words: stage-2 validity and the stage-3 "fits anywhere" test both
    come from the shift-OR valid-anchor kernel (`piece_fit_words`), so no
    axis beyond (a1, a2) is ever materialized — the former [K, a1, a2, a3]
    overlap tensor (the round-2 bench's dominant HBM term) is gone.  The
    two board words are carried as separate planes (a trailing [2] axis
    lowers to strided per-word slices on TPU).  Matches the reference
    recursion (`engine.py:174-238`).

    Args:
      bits: [K, 2] uint32 boards.
      piece_ids: [K, 3] int32.
      valid3: [K, 3, 64] bool from `valid3_bits`.
    Returns:
      [K] bool.
    """
    k = bits.shape[0]
    pb = PLACE_BITS[piece_ids]                        # [K, 3, 64, 2]
    pb0, pb1 = pb[..., 0], pb[..., 1]                 # [K, 3, 64]
    ok = jnp.zeros(k, bool)
    for i in range(3):
        # Boards after piece i at every anchor, clears applied.
        b1_0, b1_1 = _clear_lines_words(
            bits[:, None, 0] | pb0[:, i], bits[:, None, 1] | pb1[:, i]
        )                                             # [K, 64a1] each
        for j in range(3):
            if j == i:
                continue
            h = 3 - i - j
            # Valid anchors of piece j on each stage-1 board, as a bitmask
            # over a2; unpacked to gate the (a1, a2) reduction.
            f2_0, f2_1 = piece_fit_words(b1_0, b1_1, piece_ids[:, j])
            v2 = unpack_cells(jnp.stack([f2_0, f2_1], -1))  # [K, a1, a2]
            b2_0, b2_1 = _clear_lines_words(
                b1_0[:, :, None] | pb0[:, j][:, None, :],
                b1_1[:, :, None] | pb1[:, j][:, None, :],
            )                                         # [K, a1, a2] each
            f3_0, f3_1 = piece_fit_words(b2_0, b2_1, piece_ids[:, h])
            fits3 = (f3_0 | f3_1) != 0                # [K, a1, a2]
            ok = ok | jnp.any(
                valid3[:, i][:, :, None] & v2 & fits3, axis=(1, 2)
            )
    return ok


def solvable_disjoint(valid3: jnp.ndarray, piece_ids: jnp.ndarray) -> jnp.ndarray:
    """Sufficient check: three pairwise-disjoint valid placements exist.

    Args:
      valid3: [N, 3, 64] bool — validity of each drawn piece on the board
        (ignoring used flags; regen resets them).
      piece_ids: [N, 3] int32.
    Returns:
      [N] bool.
    """
    p0, p1, p2 = piece_ids[:, 0], piece_ids[:, 1], piece_ids[:, 2]
    v0 = valid3[:, 0]
    v1 = valid3[:, 1]
    v2 = valid3[:, 2]

    c01 = PAIR_CONFLICT[p0, p1]  # [N, 64, 64]
    c02 = PAIR_CONFLICT[p0, p2]
    nc12 = NO_CONFLICT_BF16[p1, p2]  # [N, 64, 64] bf16

    # M01[n, a0, a1]: piece0@a0 and piece1@a1 both valid and disjoint.
    m01 = (v0[:, :, None] & v1[:, None, :] & ~c01).astype(jnp.bfloat16)
    # T[n, a0, a2] = exists a1: M01 & no-conflict(p1@a1, p2@a2).
    t = jax.lax.dot_general(
        m01,
        nc12,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
    )  # batched [N, 64, 64]
    ok = (t > 0.5) & v2[:, None, :] & ~c02
    return jnp.any(ok, axis=(1, 2))


def _valid_on_flat(flat_bf16: jnp.ndarray, piece_id: jnp.ndarray) -> jnp.ndarray:
    """Validity of one piece per board over flat bf16 boards.

    Args:
      flat_bf16: [N, 64] bf16 boards (0/1).
      piece_id: [N] int32.
    Returns:
      [N, 64] bool.
    """
    occ = PLACEMENT_BF16[piece_id]  # [N, 64, 64]
    overlap = jax.lax.dot_general(
        occ,
        flat_bf16,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32,
    )  # [N, 64]
    return ANCHOR_OK[piece_id] & (overlap < 0.5)


def solvable_full(
    board: jnp.ndarray, piece_ids: jnp.ndarray, a1_block: int | None = None
) -> jnp.ndarray:
    """Exact check with simulated line clears between placements.

    Mirrors the reference recursion (`engine.py:181-238`) as an exhaustive,
    statically-shaped evaluation: for each ordered (first, second) slot pair
    (6 static combos), place the first piece at every anchor -> clear, place
    the second at every anchor -> clear, and ask whether the third piece has
    any valid anchor left.

    First-anchor positions are processed in blocks of `a1_block` so the
    second-stage boards stay a bounded [N, a1_block, 64, 64] tensor while the
    contraction stays a large MXU-friendly batched matmul (a1_block=64 folds
    the loop away entirely — right for small gathered batches).

    Args:
      board: [N, 8, 8] uint8.
      piece_ids: [N, 3] int32.
      a1_block: anchors per block (divides 64); default 64 for N<=512 else 8.
    Returns:
      [N] bool.
    """
    n = board.shape[0]
    if a1_block is None:
        a1_block = 64 if n <= 512 else 8
    assert NUM_CELLS % a1_block == 0
    num_blocks = NUM_CELLS // a1_block

    flat = board.reshape(n, NUM_CELLS).astype(jnp.uint8)
    ok = jnp.zeros(n, dtype=bool)

    for i in range(3):
        p = piece_ids[:, i]
        occ1 = PLACEMENT[p]  # [N, 64, 64] bool
        v1 = _valid_on_flat(flat.astype(jnp.bfloat16), p)  # [N, 64]
        # Boards after placing piece i at each anchor, with clears applied.
        b1 = clear_lines_flat(flat[:, None, :] | occ1.astype(jnp.uint8))
        b1_bf16 = b1.astype(jnp.bfloat16)  # [N, 64, 64]

        rest = [j for j in range(3) if j != i]
        for j in rest:
            k = rest[0] if rest[1] == j else rest[1]
            q = piece_ids[:, j]
            r = piece_ids[:, k]
            occ2 = PLACEMENT_BF16[q]  # [N, 64, 64]
            occ2_u8 = PLACEMENT[q].astype(jnp.uint8)
            occ3 = PLACEMENT_BF16[r]
            anchor_ok_r = ANCHOR_OK[r]  # [N, 64]

            # valid2[n, a1, a2]: piece j fits at a2 on the board after (i@a1).
            ov2 = jax.lax.dot_general(
                b1_bf16,
                occ2,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=_F32,
            )  # [N, a1, a2]
            v2 = ANCHOR_OK[q][:, None, :] & (ov2 < 0.5) & v1[:, :, None]

            def block_body(blk, acc, b1=b1, occ2_u8=occ2_u8, occ3=occ3,
                           v2=v2, anchor_ok_r=anchor_ok_r):
                # Boards after (i@a1, j@a2) for a1 in this block, all a2.
                base = jax.lax.dynamic_slice_in_dim(
                    b1, blk * a1_block, a1_block, axis=1
                )  # [N, B, 64]
                b2 = clear_lines_flat(
                    base[:, :, None, :] | occ2_u8[:, None, :, :]
                )  # [N, B, a2, 64]
                ov3 = jax.lax.dot_general(
                    b2.reshape(n, a1_block * NUM_CELLS, NUM_CELLS
                               ).astype(jnp.bfloat16),
                    occ3,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=_F32,
                ).reshape(n, a1_block, NUM_CELLS, NUM_CELLS)  # [N,B,a2,a3]
                v3_any = jnp.any(
                    anchor_ok_r[:, None, None, :] & (ov3 < 0.5), axis=3
                )  # [N, B, a2]
                v2_blk = jax.lax.dynamic_slice_in_dim(
                    v2, blk * a1_block, a1_block, axis=1
                )
                return acc | jnp.any(v2_blk & v3_any, axis=(1, 2))

            if num_blocks == 1:
                ok = ok | block_body(0, jnp.zeros(n, bool))
            else:
                ok = ok | jax.lax.fori_loop(
                    0, num_blocks, block_body, jnp.zeros(n, bool)
                )

    return ok
