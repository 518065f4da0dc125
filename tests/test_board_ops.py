"""Board-kernel behavior pins (reference: tests/test_board.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from bbx.engine import kernel as K
from bbx.engine import pieces as P


def board_from(grid) -> jnp.ndarray:
    return jnp.asarray(np.array(grid, dtype=np.uint8))[None]


def test_empty_board_validity():
    b = K.empty_boards(1)
    v = K.valid_anchors_all_pieces(b)
    assert v.shape == (1, 37, 64)
    np.testing.assert_array_equal(np.asarray(v[0]), P.ANCHOR_OK)


def test_placement_counts_on_empty():
    v = K.valid_anchors_all_pieces(K.empty_boards(1))[0]
    assert int(v[P.NAME_TO_INDEX["SINGLE"]].sum()) == 64
    assert int(v[P.NAME_TO_INDEX["I_H"]].sum()) == 40  # ref test_board.py:229-240


def test_collision_and_bounds():
    g = np.zeros((8, 8), dtype=np.uint8)
    g[0, 0] = 1
    v = K.valid_anchors_all_pieces(board_from(g))[0]
    single = P.NAME_TO_INDEX["SINGLE"]
    assert not v[single, 0]            # occupied
    assert v[single, 1]                # neighbor free
    ih = P.NAME_TO_INDEX["I_H"]
    assert not v[ih, 0]                # overlaps (0,0)
    assert not v[ih, 5]                # would stick out past col 7
    assert v[ih, 4]                    # cols 4-7 fit


def test_place_and_clear_single_row():
    b = K.empty_boards(1)
    trio = P.NAME_TO_INDEX["TRIO_H"]
    dom = P.NAME_TO_INDEX["DOMINO_H"]
    b = K.place(b, jnp.array([trio]), jnp.array([0]))
    b = K.place(b, jnp.array([trio]), jnp.array([3]))
    b = K.place(b, jnp.array([dom]), jnp.array([6]))
    assert int(K.total_blocks(b)[0]) == 8
    nb, rows, cols = K.clear_lines(b)
    assert int(rows[0]) == 1 and int(cols[0]) == 0
    assert int(K.total_blocks(nb)[0]) == 0


def test_simultaneous_row_and_col_clear():
    g = np.zeros((8, 8), dtype=np.uint8)
    g[3, :] = 1
    g[:, 5] = 1
    nb, rows, cols = K.clear_lines(board_from(g))
    assert int(rows[0]) == 1 and int(cols[0]) == 1
    assert int(K.total_blocks(nb)[0]) == 0


def test_full_board_clears_everything():
    g = np.ones((8, 8), dtype=np.uint8)
    nb, rows, cols = K.clear_lines(board_from(g))
    assert int(rows[0]) == 8 and int(cols[0]) == 8
    assert int(K.total_blocks(nb)[0]) == 0


def test_partial_lines_not_cleared():
    g = np.zeros((8, 8), dtype=np.uint8)
    g[0, :7] = 1
    nb, rows, cols = K.clear_lines(board_from(g))
    assert int(rows[0]) == 0 and int(cols[0]) == 0
    assert int(K.total_blocks(nb)[0]) == 7


def test_hole_counting_corner_case():
    # Blocks at (0,1),(1,0),(1,2),(2,1) create TWO holes: (0,0) and (1,1)
    # (reference tests/test_board.py:387-400).
    g = np.zeros((8, 8), dtype=np.uint8)
    for r, c in [(0, 1), (1, 0), (1, 2), (2, 1)]:
        g[r, c] = 1
    assert int(K.count_holes(board_from(g))[0]) == 2


def test_hole_counting_empty_and_single():
    assert int(K.count_holes(K.empty_boards(1))[0]) == 0
    g = np.zeros((8, 8), dtype=np.uint8)
    g[4, 4] = 1
    assert int(K.count_holes(board_from(g))[0]) == 0


def test_center_openness_extremes():
    assert float(K.center_openness(K.empty_boards(1))[0]) == 1.0
    g = np.zeros((8, 8), dtype=np.uint8)
    g[2:6, 2:6] = 1
    assert float(K.center_openness(board_from(g))[0]) == 0.0


def test_height_map_and_bumpiness():
    g = np.zeros((8, 8), dtype=np.uint8)
    g[7, 0] = 1          # height 1 in col 0
    g[5, 1] = 1          # height 3 in col 1
    h = np.asarray(K.height_map(board_from(g))[0])
    assert h[0] == 1 and h[1] == 3 and h[2:].sum() == 0
    # heights [1,3,0,...]: |1-3| + |3-0| = 5
    assert int(K.bumpiness(board_from(g))[0]) == 5


def test_bumpiness_explicit():
    g = np.zeros((8, 8), dtype=np.uint8)
    g[7, :] = 1  # flat height 1 everywhere
    assert int(K.bumpiness(board_from(g))[0]) == 0


def test_action_codec_roundtrip():
    # Pins from reference tests/test_environment.py:185-211.
    assert int(K.encode_action(0, 0, 0)) == 0
    assert int(K.encode_action(1, 0, 0)) == 64
    assert int(K.encode_action(0, 7, 7)) == 63
    slot, anchor = K.decode_action(jnp.array([0, 64, 63, 191]))
    np.testing.assert_array_equal(np.asarray(slot), [0, 1, 0, 2])
    np.testing.assert_array_equal(np.asarray(anchor), [0, 0, 63, 63])


def test_batched_independence():
    # Ops must act lane-wise: mixing two boards in one batch gives the same
    # result as processing them separately.
    rng = np.random.default_rng(1)
    g1 = (rng.random((8, 8)) < 0.4).astype(np.uint8)
    g2 = (rng.random((8, 8)) < 0.7).astype(np.uint8)
    both = jnp.asarray(np.stack([g1, g2]))
    v_both = K.valid_anchors_all_pieces(both)
    v1 = K.valid_anchors_all_pieces(board_from(g1))
    v2 = K.valid_anchors_all_pieces(board_from(g2))
    np.testing.assert_array_equal(np.asarray(v_both[0]), np.asarray(v1[0]))
    np.testing.assert_array_equal(np.asarray(v_both[1]), np.asarray(v2[0]))


def test_validity_vs_reference_board(reference_src):
    if reference_src is None:
        pytest.skip("reference unavailable")
    import sys
    sys.path.insert(0, reference_src)
    try:
        from game.board import Board as RefBoard
        from game import pieces as refp
    except ImportError:
        pytest.skip("reference import failed")

    rng = np.random.default_rng(7)
    for _ in range(10):
        g = (rng.random((8, 8)) < rng.uniform(0.1, 0.8)).astype(np.int8)
        rb = RefBoard()
        rb.set_state(g)
        ours = np.asarray(K.valid_anchors_all_pieces(board_from(g))[0])
        for p_idx in rng.integers(0, 37, size=8):
            piece = refp.PIECE_LIST[int(p_idx)]
            for a in rng.integers(0, 64, size=16):
                r, c = divmod(int(a), 8)
                assert ours[p_idx, a] == rb.can_place(piece, r, c), (
                    f"mismatch piece={piece.name} at ({r},{c})"
                )
