"""Engine-step semantics: scoring, streak, regen, game over, invalid actions.

Includes exhaustive differential trajectories against the actual reference
engine/env (`/root/reference/src`), stepping both implementations from
identical states and comparing every observable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bbx.engine import kernel as K
from bbx.engine import pieces as P
from bbx.engine import state as ST
from bbx.engine.step import RewardConfig, observe, step


def single_state(board, ids, used=(False, False, False), **kw):
    return ST.from_components(np.asarray(board, np.uint8), [list(ids)], [list(used)], **kw)


def test_placement_score_no_clear():
    ids = [P.NAME_TO_INDEX["O"], P.NAME_TO_INDEX["SINGLE"], P.NAME_TO_INDEX["TRIO_H"]]
    st = single_state(np.zeros((8, 8)), ids)
    # Place the O (4 blocks) at (0,0): action slot 0, anchor 0.
    out = step(st, jnp.array([0]), auto_reset=False)
    assert int(out.state.score[0]) == 4          # +1/block, engine.py:263-272
    assert int(out.state.moves[0]) == 1
    assert int(out.state.streak[0]) == 0
    assert bool(out.state.used[0, 0])
    assert not bool(out.done[0])
    # reward: 4*0.01 + 0.001 survival + center unchanged bonus 0.002
    assert float(out.reward[0]) == pytest.approx(0.04 + 0.001 + 0.002)


def test_first_clear_scores_with_streak_mult_2():
    """The reference increments combo_count *before* reading the streak
    multiplier, so the very first clear gets x2 (engine.py:419-428)."""
    g = np.zeros((8, 8), np.uint8)
    g[0, :6] = 1  # row 0 missing two cells
    ids = [P.NAME_TO_INDEX["DOMINO_H"]] * 3
    st = single_state(g, ids)
    act = int(K.encode_action(0, 0, 6))
    out = step(st, jnp.array([act]), auto_reset=False)
    # placement 2 + lines(1)*8*10*combo(1)*streak(min(0+1+1,8)=2) = 2 + 160
    assert int(out.state.score[0]) == 162
    assert int(out.state.streak[0]) == 1
    assert int(out.state.lines_total[0]) == 1
    assert int(out.state.max_streak[0]) == 1


def test_streak_resets_on_non_clearing_move():
    ids = [P.NAME_TO_INDEX["SINGLE"]] * 3
    st = single_state(np.zeros((8, 8)), ids, streak=[3])
    out = step(st, jnp.array([0]), auto_reset=False)
    assert int(out.state.streak[0]) == 0


def test_double_line_clear_scoring():
    g = np.zeros((8, 8), np.uint8)
    g[0, :6] = 1
    g[1, :6] = 1
    ids = [P.NAME_TO_INDEX["O"]] * 3
    st = single_state(g, ids)
    act = int(K.encode_action(0, 0, 6))
    out = step(st, jnp.array([act]), auto_reset=False)
    # placement 4 + 2*8*10*min(2,4)*min(0+1+1,8)=4 + 160*2*2 = 4+640
    assert int(out.state.score[0]) == 644


def test_invalid_action_unchanged_state():
    g = np.zeros((8, 8), np.uint8)
    g[0, 0] = 1
    ids = [P.NAME_TO_INDEX["SINGLE"]] * 3
    st = single_state(g, ids, score=[42], streak=[2], moves=[7])
    out = step(st, jnp.array([0]), auto_reset=False)  # cell occupied
    assert float(out.reward[0]) == -10.0
    assert int(out.state.score[0]) == 42
    assert int(out.state.streak[0]) == 2
    assert int(out.state.moves[0]) == 7
    assert not bool(out.done[0])
    assert bool(out.info["invalid_action"][0])
    np.testing.assert_array_equal(np.asarray(out.state.board), np.asarray(st.board))


def test_used_piece_is_invalid():
    ids = [P.NAME_TO_INDEX["SINGLE"]] * 3
    st = single_state(np.zeros((8, 8)), ids, used=(True, False, False))
    out = step(st, jnp.array([0]), auto_reset=False)
    assert float(out.reward[0]) == -10.0


def test_regen_after_all_three_used():
    ids = [P.NAME_TO_INDEX["SINGLE"]] * 3
    st = single_state(np.zeros((8, 8)), ids, used=(True, True, False))
    out = step(st, jnp.array([int(K.encode_action(2, 4, 4))]), auto_reset=False)
    assert not np.asarray(out.state.used).any()      # fresh turn
    assert (np.asarray(out.state.piece_ids) >= 0).all()
    assert (np.asarray(out.state.piece_ids) < 37).all()


def test_observation_structure():
    ids = [P.NAME_TO_INDEX["T_UP"], P.NAME_TO_INDEX["O"], P.NAME_TO_INDEX["I5_H"]]
    st = single_state(np.zeros((8, 8)), ids, used=(False, True, False))
    obs = observe(st)
    assert obs["board"].shape == (1, 8, 8)
    assert obs["pieces"].shape == (1, 3, 8, 8)
    assert obs["action_mask"].shape == (1, 192)
    # Used piece slot renders as zeros and its actions are masked out
    # (engine.py:493-497, tests/test_engine.py:383-393).
    assert float(obs["pieces"][0, 1].sum()) == 0.0
    assert not np.asarray(obs["action_mask"][0, 64:128]).any()
    np.testing.assert_array_equal(
        np.asarray(obs["pieces"][0, 0]), P.PIECE_MASKS[ids[0]]
    )


def test_reset_and_autoreset():
    keys = ST.make_env_keys(0, 8)
    st = ST.reset(keys)
    assert st.num_envs == 8
    obs = observe(st)
    assert np.asarray(obs["action_mask"]).any(axis=1).all()
    # Step many times with random valid actions; auto-reset keeps all lanes alive.
    rng = np.random.default_rng(0)
    jstep = jax.jit(lambda s, a: step(s, a))
    saw_done = False
    for _ in range(300):
        mask = np.asarray(observe(st)["action_mask"])
        probs = mask / mask.sum(axis=1, keepdims=True)
        acts = np.array([rng.choice(192, p=probs[i]) for i in range(8)])
        out = jstep(st, jnp.asarray(acts))
        st = out.state
        if bool(np.asarray(out.done).any()):
            saw_done = True
        assert not np.asarray(st.done).any()  # auto-reset clears done
    assert saw_done, "no episode finished in 300 random steps"


def test_batch_of_one_equals_batch_of_many():
    """Lane independence: stepping N envs in one batch == stepping each alone."""
    keys = ST.make_env_keys(123, 4)
    st = ST.reset(keys)
    rng = np.random.default_rng(1)
    mask = np.asarray(observe(st)["action_mask"])
    acts = np.array([rng.choice(np.nonzero(mask[i])[0]) for i in range(4)])
    out_batch = step(st, jnp.asarray(acts), auto_reset=False)

    for i in range(4):
        sub = jax.tree.map(lambda x: x[i:i + 1], st)
        out_i = step(sub, jnp.asarray(acts[i:i + 1]), auto_reset=False)
        for name in ("board", "score", "streak", "piece_ids", "used", "done"):
            np.testing.assert_array_equal(
                np.asarray(getattr(out_i.state, name)[0]),
                np.asarray(getattr(out_batch.state, name)[i]),
                err_msg=f"lane {i} field {name}",
            )
        assert float(out_i.reward[0]) == pytest.approx(float(out_batch.reward[i]))


# ---------------------------------------------------------------------------
# Differential trajectories vs. the actual reference implementation.
# ---------------------------------------------------------------------------

def _ref_env(reference_src, seed):
    import sys
    sys.path.insert(0, reference_src)
    from environment.block_blast_env import BlockBlastEnv
    from game import pieces as refp
    return BlockBlastEnv(seed=seed), refp


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_differential_trajectory_vs_reference(reference_src, seed):
    """Step the reference env and our engine from identical states for a full
    episode; compare mask, board, score, streak, lines, reward at every move."""
    if reference_src is None:
        pytest.skip("reference unavailable")
    try:
        env, refp = _ref_env(reference_src, seed)
    except ImportError:
        pytest.skip("reference deps unavailable")

    env.reset(seed=seed)
    rng = np.random.default_rng(seed)
    jstep = jax.jit(lambda s, a: step(s, a, auto_reset=False))

    for t in range(300):
        eng = env.engine
        ids = [refp.PIECE_LIST.index(p) for p in eng.current_pieces]
        st = ST.from_components(
            eng.board.get_state().astype(np.uint8),
            [ids],
            [list(eng.pieces_used)],
            score=[eng.score],
            streak=[eng.combo_count],
            moves=[eng.moves_made],
            lines_total=[eng.total_lines_cleared],
            max_streak=[eng.max_combo],
            prev_holes=[env._prev_holes],
            prev_center=[env._prev_center_openness],
        )
        ref_mask = env.get_action_mask()
        our_mask = np.asarray(observe(st)["action_mask"][0])
        np.testing.assert_array_equal(our_mask, ref_mask, err_msg=f"mask @ t={t}")

        valid_actions = np.nonzero(ref_mask)[0]
        if len(valid_actions) == 0:
            break
        # Occasionally probe the invalid-action path too.
        if t % 11 == 3:
            invalid = np.nonzero(~ref_mask)[0]
            action = int(rng.choice(invalid)) if len(invalid) else int(rng.choice(valid_actions))
        else:
            action = int(rng.choice(valid_actions))

        prev_all_used_after = None
        # Detect whether this ref move will consume the 3rd piece (regen).
        slot = action // 64
        will_regen = (
            ref_mask[action]
            and sum(eng.pieces_used) == 2
            and not eng.pieces_used[slot]
        )

        _, ref_reward, ref_term, _, ref_info = env.step(action)
        out = jstep(st, jnp.array([action]))

        np.testing.assert_array_equal(
            np.asarray(out.state.board[0]),
            eng.board.get_state().astype(np.uint8),
            err_msg=f"board @ t={t}",
        )
        assert int(out.state.score[0]) == eng.score, f"score @ t={t}"
        assert int(out.state.streak[0]) == eng.combo_count, f"streak @ t={t}"
        assert int(out.state.moves[0]) == eng.moves_made, f"moves @ t={t}"
        assert int(out.state.lines_total[0]) == eng.total_lines_cleared
        assert int(out.state.max_streak[0]) == eng.max_combo
        assert float(out.reward[0]) == pytest.approx(ref_reward, abs=1e-5), (
            f"reward @ t={t}: ours={float(out.reward[0])} ref={ref_reward}"
        )
        if not will_regen:
            # With no regen the piece sets match, so game-over must too.
            assert bool(out.done[0]) == ref_term, f"done @ t={t}"
        if ref_term:
            break
