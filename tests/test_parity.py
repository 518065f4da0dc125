"""Bit-exact seeded-trajectory parity vs the actual reference implementation.

BASELINE.md target row 1: a full episode from `reset(seed)` must match the
reference golden — identical piece draws (NumPy PCG64 stream), identical
board / score / combo / pieces at every move, identical game-over point.
`ParityEngine` consumes the RNG exactly like `GameEngine._generate_new_
pieces` (`/root/reference/src/game/engine.py:155-172`), so the two engines
stay in lockstep for arbitrarily long move sequences.
"""
import numpy as np
import pytest

from bbx.engine.parity import ParityEngine


def _ref_engine(reference_src, seed):
    import sys

    sys.path.insert(0, reference_src)
    from game import pieces as refp
    from game.engine import GameEngine

    return GameEngine(seed=seed), refp


def _compare(ours: ParityEngine, eng, refp, t: int):
    ref_ids = [refp.PIECE_LIST.index(p) for p in eng.current_pieces]
    assert list(ours.piece_ids) == ref_ids, f"piece draw mismatch @ move {t}"
    assert list(ours.used) == list(eng.pieces_used), f"used @ move {t}"
    np.testing.assert_array_equal(
        ours.board, eng.board.get_state().astype(np.uint8),
        err_msg=f"board @ move {t}",
    )
    assert ours.score == eng.score, f"score @ move {t}"
    assert ours.combo_count == eng.combo_count, f"combo @ move {t}"
    assert ours.moves_made == eng.moves_made, f"moves @ move {t}"
    assert ours.total_lines_cleared == eng.total_lines_cleared, f"lines @ {t}"
    assert ours.max_combo == eng.max_combo, f"max_combo @ move {t}"
    assert ours.game_over == (not eng.has_valid_moves()), f"game_over @ {t}"


@pytest.mark.parametrize("seed", [0, 1, 7, 42, 1234])
def test_seeded_golden_trajectory(reference_src, seed):
    """Play one full seeded episode in both engines with the same actions."""
    if reference_src is None:
        pytest.skip("reference unavailable")
    try:
        eng, refp = _ref_engine(reference_src, seed)
    except ImportError:
        pytest.skip("reference deps unavailable")

    ours = ParityEngine(seed=seed)
    action_rng = np.random.default_rng(seed + 9999)

    for t in range(600):
        _compare(ours, eng, refp, t)
        if ours.game_over:
            break
        moves = ours.get_valid_moves()
        assert moves, "mask empty but game not over"
        piece, row, col = moves[action_rng.integers(len(moves))]
        ok_ref = eng.make_move(piece, row, col).success
        ok_ours = ours.make_move(piece, row, col)
        assert ok_ref and ok_ours, f"move rejected @ {t}"
    else:
        pytest.fail("episode did not terminate within 600 moves")

    # Terminal states agree.
    _compare(ours, eng, refp, -1)
    assert ours.game_over


def test_invalid_move_parity(reference_src):
    """Invalid moves are rejected without consuming RNG or mutating state."""
    if reference_src is None:
        pytest.skip("reference unavailable")
    eng, refp = _ref_engine(reference_src, 5)
    ours = ParityEngine(seed=5)

    mask = ours.get_action_mask()
    invalid = np.argwhere(~mask)
    piece, row, col = (int(x) for x in invalid[0])
    assert eng.make_move(piece, row, col).success is False
    assert ours.make_move(piece, row, col) is False
    _compare(ours, eng, refp, 0)
