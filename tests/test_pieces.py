"""Piece catalogue pins (reference: tests/test_pieces.py)."""
import numpy as np
import pytest

from bbx.engine import pieces as P


def test_exactly_37_pieces():
    assert P.NUM_PIECE_TYPES == 37
    assert len(P.PIECE_NAMES) == 37
    assert len(set(P.PIECE_NAMES)) == 37


@pytest.mark.parametrize(
    "name,count",
    [
        ("SINGLE", 1),
        ("DOMINO_H", 2), ("DOMINO_V", 2),
        ("DIAG2_TL_BR", 2), ("DIAG2_TR_BL", 2),
        ("TRIO_H", 3), ("TRIO_V", 3),
        ("DIAG3_TL_BR", 3), ("DIAG3_TR_BL", 3),
        ("TRIO_L1", 3), ("TRIO_L2", 3), ("TRIO_L3", 3), ("TRIO_L4", 3),
        ("I_H", 4), ("I_V", 4),
        ("I5_H", 5), ("I5_V", 5),
        ("O", 4),
        ("T_UP", 4), ("T_DOWN", 4), ("T_LEFT", 4), ("T_RIGHT", 4),
        ("S_H", 4), ("S_V", 4), ("Z_H", 4), ("Z_V", 4),
        ("L_1", 4), ("L_2", 4), ("L_3", 4), ("L_4", 4),
        ("J_1", 4), ("J_2", 4), ("J_3", 4), ("J_4", 4),
        ("RECT_2x3_H", 6), ("RECT_2x3_V", 6),
        ("SQUARE_3x3", 9),
    ],
)
def test_block_counts(name, count):
    idx = P.NAME_TO_INDEX[name]
    assert P.PIECE_NBLOCKS[idx] == count
    assert len(P.PIECE_OFFSETS[idx]) == count


def test_normalized_to_origin():
    for offs in P.PIECE_OFFSETS:
        assert min(r for r, _ in offs) == 0
        assert min(c for _, c in offs) == 0


def test_no_duplicate_offsets():
    for offs in P.PIECE_OFFSETS:
        assert len(set(offs)) == len(offs)


def test_exact_shapes():
    # Pins from reference tests/test_pieces.py:175-182 and piece art.
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["T_UP"]]) == {(0, 1), (1, 0), (1, 1), (1, 2)}
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["S_H"]]) == {(0, 1), (0, 2), (1, 0), (1, 1)}
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["Z_H"]]) == {(0, 0), (0, 1), (1, 1), (1, 2)}
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["L_4"]]) == {(0, 2), (1, 0), (1, 1), (1, 2)}
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["J_2"]]) == {(0, 0), (1, 0), (1, 1), (1, 2)}
    assert set(P.PIECE_OFFSETS[P.NAME_TO_INDEX["DIAG3_TR_BL"]]) == {(0, 2), (1, 1), (2, 0)}


def test_registry_order_matches_reference():
    expected = [
        "SINGLE", "DOMINO_H", "DOMINO_V", "DIAG2_TL_BR", "DIAG2_TR_BL",
        "TRIO_H", "TRIO_V", "DIAG3_TL_BR", "DIAG3_TR_BL",
        "TRIO_L1", "TRIO_L2", "TRIO_L3", "TRIO_L4",
        "I_H", "I_V", "I5_H", "I5_V", "O",
        "T_UP", "T_DOWN", "T_LEFT", "T_RIGHT",
        "S_H", "S_V", "Z_H", "Z_V",
        "L_1", "L_2", "L_3", "L_4",
        "J_1", "J_2", "J_3", "J_4",
        "RECT_2x3_H", "RECT_2x3_V", "SQUARE_3x3",
    ]
    assert P.PIECE_NAMES == expected


def test_masks_and_shape_arrays():
    sq = P.NAME_TO_INDEX["SQUARE_3x3"]
    m = P.piece_mask(sq)
    assert m.shape == (8, 8)
    assert m[:3, :3].sum() == 9 and m.sum() == 9
    arr = P.piece_shape_array(P.NAME_TO_INDEX["T_UP"])
    assert arr.shape == (2, 3)
    assert arr.tolist() == [[0, 1, 0], [1, 1, 1]]
    oh = P.piece_one_hot(5)
    assert oh.shape == (37,) and oh[5] == 1.0 and oh.sum() == 1.0


def test_anchor_ok_counts():
    # SINGLE fits at all 64 cells; I_H (1x4) at 8 rows x 5 cols = 40
    # (reference tests/test_board.py:229-240); 3x3 square at 6x6 = 36.
    assert P.ANCHOR_OK[P.NAME_TO_INDEX["SINGLE"]].sum() == 64
    assert P.ANCHOR_OK[P.NAME_TO_INDEX["I_H"]].sum() == 40
    assert P.ANCHOR_OK[P.NAME_TO_INDEX["I5_V"]].sum() == 32
    assert P.ANCHOR_OK[P.NAME_TO_INDEX["SQUARE_3x3"]].sum() == 36


def test_placement_table_consistency():
    rng = np.random.default_rng(0)
    for _ in range(50):
        p = int(rng.integers(37))
        a = int(rng.integers(64))
        r, c = divmod(a, 8)
        occ = P.PLACEMENT[p, a].reshape(8, 8)
        if P.ANCHOR_OK[p, a]:
            cells = {(r + dr, c + dc) for dr, dc in P.PIECE_OFFSETS[p]}
            got = {(i, j) for i in range(8) for j in range(8) if occ[i, j]}
            assert got == cells
        else:
            assert not occ.any()


def test_pair_conflict_symmetry_and_diag():
    # conflict(p@a, q@b) == conflict(q@b, p@a)
    pc = P.PAIR_CONFLICT
    assert np.array_equal(pc[3, 7], pc[7, 3].T)
    # A piece always conflicts with itself at the same in-bounds anchor.
    for p in range(37):
        for a in (0, 9, 27):
            if P.ANCHOR_OK[p, a]:
                assert pc[p, p, a, a]


def test_parity_with_reference_piece_module(reference_src):
    if reference_src is None:
        pytest.skip("reference unavailable")
    import sys
    sys.path.insert(0, reference_src)
    try:
        from game import pieces as ref
    except ImportError:
        pytest.skip("reference import failed")
    assert ref.NUM_PIECES == P.NUM_PIECE_TYPES
    for i, rp in enumerate(ref.PIECE_LIST):
        assert rp.name == P.PIECE_NAMES[i]
        assert set(rp.blocks) == set(P.PIECE_OFFSETS[i])
