"""Solvability predicate tests: the regen fast path, full path, and the
empty-board lemma that lets auto-reset skip the retry loop entirely."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bbx.engine import kernel as K
from bbx.engine import pieces as P
from bbx.engine import solvability as S


def _valid3(board, ids):
    return K.valid_anchors_for(board, ids)


def _verdict(board, ids, ke=32):
    """The production verdict (fast | exact over a compacted exact buffer),
    as `bbx.engine.state._verdict_flat` runs it inside regen; a small `ke`
    exercises the internal re-run loop on batches with many exact lanes."""
    from bbx.engine.state import _verdict_flat
    bits = S.board_bits(board)
    need = jnp.ones(board.shape[0], bool)
    return _verdict_flat(bits, ids, need, ke=ke)


def test_empty_board_lemma_exhaustive():
    """Every triple of the 37 pieces has 3 pairwise-disjoint placements on an
    empty board — so `fresh_pieces` may skip the solvability retry loop
    (see bbx/engine/state.py:fresh_pieces).

    The disjoint-placement predicate is permutation-invariant, so checking
    the 9,139 sorted triples covers all 37^3 draws.
    """
    triples = np.array(
        [(a, b, c)
         for a in range(37) for b in range(a, 37) for c in range(b, 37)],
        dtype=np.int32,
    )
    anchor_ok = jnp.asarray(P.ANCHOR_OK)
    chunk = 4096
    for start in range(0, len(triples), chunk):
        ids = jnp.asarray(triples[start:start + chunk])
        valid3 = anchor_ok[ids]  # empty-board validity
        ok = S.solvable_disjoint(valid3, ids)
        assert bool(jnp.all(ok)), (
            f"empty-board lemma violated in chunk starting {start}"
        )


def test_disjoint_fast_path_positive():
    board = K.empty_boards(1)
    ids = jnp.array([[P.NAME_TO_INDEX["SQUARE_3x3"]] * 3])
    ok = S.solvable_disjoint(_valid3(board, ids), ids)
    assert bool(ok[0])


def test_disjoint_fast_path_negative_full_board():
    g = np.ones((8, 8), dtype=np.uint8)
    g[0, 0] = 0  # a single free cell
    board = jnp.asarray(g)[None]
    ids = jnp.array([[P.NAME_TO_INDEX["SINGLE"], P.NAME_TO_INDEX["SINGLE"],
                      P.NAME_TO_INDEX["SINGLE"]]])
    ok = S.solvable_disjoint(_valid3(board, ids), ids)
    assert not bool(ok[0])


def test_full_path_needs_clears():
    """Construct a board where the triple is solvable ONLY via a line clear:
    row 0 has one free cell; two more singles fit only after row 0 clears...
    Actually with singles there is always space if cells are free, so use a
    board with exactly one free cell: single+single+single requires clears."""
    g = np.ones((8, 8), dtype=np.uint8)
    g[0, 0] = 0
    board = jnp.asarray(g)[None]
    single = P.NAME_TO_INDEX["SINGLE"]
    ids = jnp.array([[single, single, single]])
    # Placing the single at (0,0) completes row 0 AND col 0 -> both clear,
    # opening 15 cells; the remaining singles then fit.
    ok_full = S.solvable_full(board, ids)
    assert bool(ok_full[0])
    ok = _verdict(board, ids)
    assert bool(ok[0])


def test_unsolvable_board():
    g = np.ones((8, 8), dtype=np.uint8)
    g[0, 0] = 0
    g[0, 3] = 0  # two free cells, row/col never completes with one single
    # Remove another cell from row 0 and col 0 so placing a single can't
    # complete any line.
    g[5, 0] = 0
    board = jnp.asarray(g)[None]
    i5 = P.NAME_TO_INDEX["I5_H"]
    ids = jnp.array([[i5, i5, i5]])
    ok = _verdict(board, ids)
    assert not bool(ok[0])


def test_gathered_full_path_exactness():
    """`solvable` on a large batch (gather/scatter path) must equal per-lane
    full search, including when some lanes need clears and some don't."""
    rng = np.random.default_rng(11)
    n = 300  # far above ke=32 to exercise the compacted exact re-run loop
    boards = np.zeros((n, 8, 8), np.uint8)
    ids = rng.integers(0, 37, size=(n, 3)).astype(np.int32)
    single = P.NAME_TO_INDEX["SINGLE"]
    for i in range(n):
        kind = i % 3
        if kind == 0:
            boards[i] = (rng.random((8, 8)) < 0.5)
        elif kind == 1:
            # one free cell: singles solvable only via clears
            boards[i] = 1
            boards[i, 0, 0] = 0
            ids[i] = [single] * 3
        else:
            # two isolated free cells: three singles unsolvable
            boards[i] = 1
            boards[i, 0, 0] = 0
            boards[i, 4, 4] = 0
            ids[i] = [single] * 3

    board = jnp.asarray(boards)
    idsj = jnp.asarray(ids)
    got = _verdict(board, idsj)
    expected = S.solvable_full(board, idsj, a1_block=8)
    # fast path can only add lanes that full search also accepts
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_differential_vs_reference(reference_src):
    if reference_src is None:
        pytest.skip("reference unavailable")
    import sys
    sys.path.insert(0, reference_src)
    try:
        from game.engine import GameEngine
        from game import pieces as refp
    except ImportError:
        pytest.skip("reference import failed")

    rng = np.random.default_rng(3)
    boards, triples, expected = [], [], []
    for trial in range(40):
        fill = rng.uniform(0.3, 0.9)
        g = (rng.random((8, 8)) < fill).astype(np.int8)
        ids = rng.integers(0, 37, size=3)
        eng = GameEngine(seed=0)
        eng.board.set_state(g)
        eng.current_pieces = [refp.PIECE_LIST[int(i)] for i in ids]
        eng.pieces_used = [False, False, False]
        expected.append(eng._can_place_all_pieces())
        boards.append(g.astype(np.uint8))
        triples.append(ids)

    board = jnp.asarray(np.stack(boards))
    ids = jnp.asarray(np.stack(triples).astype(np.int32))
    ok = _verdict(board, ids)
    np.testing.assert_array_equal(np.asarray(ok), np.array(expected))


# ---------------------------------------------------------------------------
# Bitboard kernels (the production regen path) vs the dense oracles.
# ---------------------------------------------------------------------------

def _random_boards_and_ids(seed, n):
    rng = np.random.default_rng(seed)
    fills = rng.uniform(0.0, 0.8, n)
    raw = (rng.random((n, 8, 8)) < fills[:, None, None]).astype(np.uint8)
    board, _, _ = jax.jit(K.clear_lines)(jnp.asarray(raw))
    ids = jnp.asarray(rng.integers(0, 37, (n, 3)), jnp.int32)
    return jnp.asarray(raw), board, ids


def test_bitboard_pack_unpack_roundtrip():
    _, board, _ = _random_boards_and_ids(0, 256)
    flat = board.reshape(-1, 64)
    bits = S.pack_cells(flat)
    np.testing.assert_array_equal(np.asarray(S.unpack_cells(bits)),
                                  np.asarray(flat > 0))


def test_bitboard_clear_lines_matches_dense():
    raw, board, _ = _random_boards_and_ids(1, 256)
    for b in (raw, board):  # with and without pre-existing full lines
        flat = b.reshape(-1, 64)
        got = S.unpack_cells(jax.jit(S.clear_lines_bits)(S.pack_cells(flat)))
        ref = K.clear_lines_flat(flat) > 0
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bitboard_validity_matches_matmul():
    _, board, ids = _random_boards_and_ids(2, 256)
    bits = S.board_bits(board)
    ref = K.gather_piece_validity(
        jax.jit(K.valid_anchors_all_pieces)(board), ids
    )
    got = jax.jit(S.valid3_bits)(bits, ids)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bitboard_disjoint_matches_dense():
    _, board, ids = _random_boards_and_ids(3, 512)
    bits = S.board_bits(board)
    v3 = jax.jit(S.valid3_bits)(bits, ids)
    ref = jax.jit(S.solvable_disjoint)(v3, ids)
    got = jax.jit(S.solvable_disjoint_bits)(bits, ids, v3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bitboard_exact_matches_brute_oracle():
    _, board, ids = _random_boards_and_ids(5, 256)
    bits = S.board_bits(board)
    v3 = jax.jit(S.valid3_bits)(bits, ids)
    ref = jax.jit(lambda b, i: S.solvable_full(b, i, a1_block=8))(board, ids)
    got = jax.jit(S.solvable_exact_bits)(bits, ids, v3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
