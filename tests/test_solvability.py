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
    pending = jnp.ones(1, bool)
    ok = S.solvable(board, K.valid_anchors_all_pieces(board), ids, pending)
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
    ok = S.solvable(board, K.valid_anchors_all_pieces(board), ids,
                    jnp.ones(1, bool))
    assert not bool(ok[0])


def test_gathered_full_path_exactness():
    """`solvable` on a large batch (gather/scatter path) must equal per-lane
    full search, including when some lanes need clears and some don't."""
    rng = np.random.default_rng(11)
    n = 300  # > GATHER_LANES to exercise the compacted path
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
    got = S.solvable(board, K.valid_anchors_all_pieces(board), idsj,
                     jnp.ones(n, bool))
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
    ok = S.solvable(board, K.valid_anchors_all_pieces(board), ids,
                    jnp.ones(len(expected), bool))
    np.testing.assert_array_equal(np.asarray(ok), np.array(expected))


def test_screens_sound_against_full_search():
    """The accept screen only accepts solvable triples, the reject screen
    only rejects unsolvable ones, and the composed `solvable` equals the
    exhaustive search — over random boards biased toward the fills where the
    screens actually fire (clear-dependent / stuck draws)."""
    rng = np.random.default_rng(123)
    n = 400
    boards = (rng.random((n, 8, 8)) < rng.uniform(0.35, 0.8, (n, 1, 1))
              ).astype(np.uint8)
    ids = jnp.asarray(rng.integers(0, 37, size=(n, 3)).astype(np.int32))
    board = jnp.asarray(boards)
    av = K.valid_anchors_all_pieces(board)
    v3 = K.gather_piece_validity(av, ids)

    exact = np.asarray(S.solvable_full(board, ids, a1_block=8))
    cand = S.clear_candidates(board, ids, v3)
    s1 = np.asarray(S.solvable_clear1(board, ids, cand))
    rej = np.asarray(S.unsolvable_certain(board, ids, v3, cand))
    fast = np.asarray(S.solvable_disjoint(v3, ids))

    # soundness: accept screen => solvable; reject screen => not solvable
    # (reject is only claimed for lanes that failed the disjoint path).
    assert not np.any(s1 & ~exact), "accept screen accepted unsolvable"
    assert not np.any(rej & ~fast & exact), "reject screen rejected solvable"

    # the composed pipeline is exact
    got = np.asarray(S.solvable(board, av, ids, jnp.ones(n, bool)))
    np.testing.assert_array_equal(got, exact)

    # make sure this distribution actually exercises every tier
    assert s1.sum() > 0 and (rej & ~fast).sum() > 0 and fast.sum() > 0


def test_exact_decomposition_equals_oracle():
    """`solvable_exact` (first-clear case decomposition) must equal the
    brute-force all-anchors search on a distribution dense in clear-dependent
    and unsolvable draws, including the adversarial shapes: solutions that
    need two sequential clears, join-clear-pair-only solutions, and boards
    with many clearing placements (exercising the multi-pass loop)."""
    rng = np.random.default_rng(7)
    n = 600
    boards = np.zeros((n, 8, 8), np.uint8)
    ids = rng.integers(0, 37, size=(n, 3)).astype(np.int32)
    single = P.NAME_TO_INDEX["SINGLE"]
    for i in range(n):
        kind = i % 4
        if kind == 0:
            boards[i] = rng.random((8, 8)) < rng.uniform(0.35, 0.85)
        elif kind == 1:
            # nearly-full rows: many clearing placements (loop path)
            boards[i] = rng.random((8, 8)) < 0.3
            for rrow in range(0, 8, 2):
                boards[i, rrow] = 1
                boards[i, rrow, rng.integers(0, 8)] = 0
        elif kind == 2:
            # one free cell: singles solvable only via cascading clears
            boards[i] = 1
            boards[i, 0, 0] = 0
            ids[i] = [single] * 3
        else:
            boards[i] = rng.random((8, 8)) < 0.6

    board = jnp.asarray(boards)
    idsj = jnp.asarray(ids)
    av = K.valid_anchors_all_pieces(board)
    v3 = K.gather_piece_validity(av, idsj)
    fast = np.asarray(S.solvable_disjoint(v3, idsj))
    oracle = np.asarray(S.solvable_full(board, idsj, a1_block=8))
    need = jnp.asarray(~fast)
    got = np.asarray(S.solvable_exact(board, idsj, v3, need))
    np.testing.assert_array_equal(got, oracle & ~fast)
    # distribution must exercise both branches
    assert (got & ~fast).sum() > 20 and ((~got) & ~fast).sum() > 20


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


def test_bitboard_clear1_matches_dense():
    _, board, ids = _random_boards_and_ids(4, 512)
    bits = S.board_bits(board)
    v3 = jax.jit(S.valid3_bits)(bits, ids)
    cand = jax.jit(S.clear_candidates)(board, ids, v3)
    ref = jax.jit(S.solvable_clear1)(board, ids, cand)
    got = jax.jit(S.solvable_clear1_bits)(bits, ids, cand)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bitboard_exact_matches_brute_oracle():
    _, board, ids = _random_boards_and_ids(5, 256)
    bits = S.board_bits(board)
    v3 = jax.jit(S.valid3_bits)(bits, ids)
    ref = jax.jit(lambda b, i: S.solvable_full(b, i, a1_block=8))(board, ids)
    got = jax.jit(S.solvable_exact_bits)(bits, ids, v3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
