"""The batched game step: place -> clear -> score -> regen -> game over.

One fused, jittable transition for the whole fleet of environments.  The
control flow of the reference (`/root/reference/src/game/engine.py:390-454`
and `/root/reference/src/environment/block_blast_env.py:224-264`) is
re-expressed as masked tensor selects; the only loops are the regen retry
`while_loop` (batch-gated) and nothing else.

Step semantics preserved exactly, including the reference's quirks:
  * invalid action: reward -10, state unchanged, episode does NOT end
    (`block_blast_env.py:240-245`);
  * `blocks_in_lines = lines_cleared * 8` ignores row/col intersections
    (`engine.py:427`);
  * the streak multiplier reads `combo_count + 1` *after* the increment, so
    the first clearing move already gets x2 (`engine.py:419-428,252-261`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr
from flax import struct

from . import kernel as K
from . import solvability as S
from .state import EnvState, fresh_pieces, regen_pieces
from .tables import (
    ANCHOR_OK,
    BOARD_SIZE,
    NUM_ACTIONS,
    NUM_CELLS,
    PIECE_MASKS,
    PIECE_NBLOCKS,
    PIECES_PER_TURN,
    PLACEMENT,
)

MAX_COMBO_MULTIPLIER = 4   # engine.py:96
MAX_STREAK_MULTIPLIER = 8  # engine.py:97
BASE_SCORE_PER_BLOCK = 10  # engine.py:95
PLACEMENT_SCORE_PER_BLOCK = 1  # engine.py:94
INVALID_ACTION_REWARD = -10.0  # block_blast_env.py:245


@struct.dataclass
class RewardConfig:
    """Shaped-reward coefficients (`block_blast_env.py:63-71`)."""

    line_clear_base: float = 1.0
    block_placed: float = 0.01
    game_over_penalty: float = -1.0
    hole_penalty: float = -0.05
    center_bonus: float = 0.02
    combo_multiplier_bonus: float = 0.5
    survival_bonus: float = 0.001


class StepOutput(NamedTuple):
    state: EnvState
    obs: dict          # {'board' [N,8,8] f32, 'pieces' [N,3,8,8] f32, 'action_mask' [N,192] bool}
    reward: jnp.ndarray  # [N] f32
    done: jnp.ndarray    # [N] bool — episode ended at this step
    info: dict           # per-env diagnostic arrays


def observe(state: EnvState, valid3: jnp.ndarray | None = None) -> dict:
    """Build the network observation (`engine.get_observation`,
    `engine.py:478-507`; flat 192 mask per `block_blast_env.py:134-146`).

    `valid3` is the [N, 3, 64] per-slot anchor validity, computed from the
    bitboard if not supplied (only the three drawn pieces ever need a mask,
    so the 37-piece validity tensor is never materialized on this path).
    """
    if valid3 is None:
        valid3 = S.valid3_bits(S.board_bits(state.board), state.piece_ids)
    mask3 = valid3 & ~state.used[:, :, None]
    mask3 = mask3 & ~state.done[:, None, None]
    pieces = PIECE_MASKS[state.piece_ids]  # [N, 3, 8, 8]
    pieces = pieces * (~state.used[:, :, None, None]).astype(jnp.float32)
    return {
        "board": state.board.astype(jnp.float32),
        "pieces": pieces,
        "action_mask": mask3.reshape(-1, NUM_ACTIONS),
    }


def _move_core(state: EnvState, actions: jnp.ndarray):
    """Pure move mechanics for all lanes (validity, placement, clears, score).

    Returns intermediate tensors for the surrounding step logic.
    """
    n = state.num_envs
    slot, anchor = K.decode_action(actions)
    piece = jnp.take_along_axis(state.piece_ids, slot[:, None], axis=1)[:, 0]

    # Point validity of the chosen (piece, anchor): bounds + no overlap +
    # piece unused + game not over (`engine.can_place_piece`, engine.py:326-346).
    occ = PLACEMENT[piece, anchor]  # [N, 64] bool
    overlap = jnp.any(occ & (state.board.reshape(n, NUM_CELLS) > 0), axis=1)
    slot_used = jnp.take_along_axis(state.used, slot[:, None], axis=1)[:, 0]
    valid = ANCHOR_OK[piece, anchor] & ~overlap & ~slot_used & ~state.done

    # Place + clear (only applied on valid lanes).
    placed = state.board | occ.reshape(n, BOARD_SIZE, BOARD_SIZE).astype(jnp.uint8)
    cleared, rows_c, cols_c = K.clear_lines(placed)
    lines = rows_c + cols_c
    new_board = jnp.where(valid[:, None, None], cleared, state.board)
    lines = jnp.where(valid, lines, 0)

    # Streak ("combo_count"): +1 on a clearing move, reset to 0 otherwise
    # (engine.py:419-424).
    cleared_any = lines > 0
    streak_after = jnp.where(cleared_any, state.streak + 1, 0)
    streak_after = jnp.where(valid, streak_after, state.streak)

    # Scoring (engine.py:274-312,426-429).  blocks_in_lines approximated as
    # lines * 8 (engine.py:427) — preserved, intersections double-counted.
    nblocks = PIECE_NBLOCKS[piece]
    combo_mult = jnp.minimum(lines, MAX_COMBO_MULTIPLIER)
    streak_mult = jnp.minimum(streak_after + 1, MAX_STREAK_MULTIPLIER)
    line_points = (
        lines * BOARD_SIZE * BASE_SCORE_PER_BLOCK * combo_mult * streak_mult
    )
    score_gained = jnp.where(
        valid,
        nblocks * PLACEMENT_SCORE_PER_BLOCK + jnp.where(cleared_any, line_points, 0),
        0,
    )

    used_after = jnp.where(
        valid[:, None],
        state.used | jax.nn.one_hot(slot, PIECES_PER_TURN, dtype=bool),
        state.used,
    )
    return (
        valid, piece, nblocks, new_board, lines, rows_c, cols_c,
        cleared_any, streak_after, combo_mult, score_gained, used_after,
    )


def step(
    state: EnvState,
    actions: jnp.ndarray,
    reward_config: RewardConfig = RewardConfig(),
    auto_reset: bool = True,
) -> StepOutput:
    """Advance every environment by one action.

    Args:
      state: batched EnvState.
      actions: [N] int32 flat actions (slot*64 + row*8 + col).
      reward_config: shaped-reward coefficients.
      auto_reset: reset finished lanes in-place (the vectorized-wrapper
        behavior, `wrappers.py:93-108`); final episode stats are surfaced in
        `info`.  With False, finished lanes stay terminal and further steps
        on them take the invalid-action path (matching `engine.py:342`).

    Returns:
      StepOutput(state, obs, reward, done, info).
    """
    n = state.num_envs
    (
        valid, piece, nblocks, new_board, lines, rows_c, cols_c,
        cleared_any, streak_after, combo_mult, score_gained, used_after,
    ) = _move_core(state, actions)

    score_after = state.score + score_gained
    moves_after = state.moves + valid.astype(jnp.int32)
    lines_total_after = state.lines_total + lines
    max_streak_after = jnp.maximum(state.max_streak, streak_after)
    blocks_total_after = state.blocks_total + jnp.where(valid, nblocks, 0)

    # Regenerate pieces when all three are used (engine.py:432-437).
    all_used = jnp.all(used_after, axis=1) & valid
    ids_after, rng_after = regen_pieces(
        new_board, state.piece_ids, state.rng, all_used
    )
    used_after = jnp.where(all_used[:, None], False, used_after)

    # Game over: no unused piece has a valid placement (engine.py:440-441).
    valid3 = S.valid3_bits(S.board_bits(new_board), ids_after)
    mask3 = valid3 & ~used_after[:, :, None]
    no_moves = ~jnp.any(mask3.reshape(n, -1), axis=1)
    done_after = jnp.where(valid, no_moves, state.done)
    game_over_now = valid & no_moves & ~state.done

    # ---- Shaped reward (`block_blast_env.py:148-193`) ----
    rc = reward_config
    holes_now = K.count_holes(new_board)
    center_now = K.center_openness(new_board)
    hole_delta = holes_now - state.prev_holes
    combo_mult_f = combo_mult.astype(jnp.float32)
    reward = (
        nblocks.astype(jnp.float32) * rc.block_placed
        + rc.survival_bonus
        + jnp.where(
            cleared_any,
            lines.astype(jnp.float32) * rc.line_clear_base * combo_mult_f
            + jnp.where(combo_mult > 1, (combo_mult_f - 1.0) * rc.combo_multiplier_bonus, 0.0),
            0.0,
        )
        + jnp.where(game_over_now, rc.game_over_penalty, 0.0)
        + jnp.where(hole_delta > 0, hole_delta.astype(jnp.float32) * rc.hole_penalty, 0.0)
        + jnp.where(center_now >= state.prev_center, rc.center_bonus * 0.1, 0.0)
    )
    reward = jnp.where(valid, reward, INVALID_ACTION_REWARD)
    # Shaping trackers only advance on valid moves (the invalid path returns
    # before `_calculate_reward`, block_blast_env.py:240-245).
    prev_holes_after = jnp.where(valid, holes_now, state.prev_holes)
    prev_center_after = jnp.where(valid, center_now, state.prev_center)

    ep_return_after = state.ep_return + reward
    ep_len_after = state.ep_len + 1

    new_state = EnvState(
        board=new_board,
        piece_ids=ids_after,
        used=used_after,
        score=score_after,
        streak=streak_after,
        moves=moves_after,
        lines_total=lines_total_after,
        max_streak=max_streak_after,
        blocks_total=blocks_total_after,
        done=done_after,
        prev_holes=prev_holes_after,
        prev_center=prev_center_after,
        ep_return=ep_return_after,
        ep_len=ep_len_after,
        rng=rng_after,
    )

    info = {
        "score": score_after,
        "moves": moves_after,
        "lines_cleared": lines_total_after,
        "max_combo": max_streak_after,
        "blocks_placed": blocks_total_after,
        "board_fill": K.total_blocks(new_board).astype(jnp.float32) / NUM_CELLS,
        "holes": holes_now,
        "invalid_action": ~valid,
        # last-move details (`block_blast_env.py:280-287`)
        "last_blocks_placed": jnp.where(valid, nblocks, 0),
        "last_lines_cleared": lines,
        "last_combo_multiplier": jnp.where(cleared_any, combo_mult, 1),
        "last_score_gained": score_gained,
        # episode-final stats, valid where `done` (wrapper's terminal info,
        # `wrappers.py:97-102`)
        "final_score": score_after,
        "final_length": ep_len_after,
        "final_return": ep_return_after,
        "final_lines": lines_total_after,
        "final_max_combo": max_streak_after,
    }

    if auto_reset:
        d = game_over_now
        split = jax.vmap(lambda k: jr.split(k, 2))(new_state.rng)
        reset_rng = jnp.where(d, split[:, 0], new_state.rng)
        draw = fresh_pieces(split[:, 1])
        zeros_i = jnp.zeros(n, jnp.int32)
        new_state = EnvState(
            board=jnp.where(d[:, None, None], 0, new_state.board).astype(jnp.uint8),
            piece_ids=jnp.where(d[:, None], draw, new_state.piece_ids),
            used=jnp.where(d[:, None], False, new_state.used),
            score=jnp.where(d, 0, new_state.score),
            streak=jnp.where(d, 0, new_state.streak),
            moves=jnp.where(d, 0, new_state.moves),
            lines_total=jnp.where(d, 0, new_state.lines_total),
            max_streak=jnp.where(d, 0, new_state.max_streak),
            blocks_total=jnp.where(d, 0, new_state.blocks_total),
            done=jnp.zeros(n, bool),
            prev_holes=jnp.where(d, 0, new_state.prev_holes),
            prev_center=jnp.where(d, 1.0, new_state.prev_center),
            ep_return=jnp.where(d, 0.0, new_state.ep_return),
            ep_len=jnp.where(d, 0, new_state.ep_len),
            rng=reset_rng,
        )
        # Masks for reset lanes come from the empty board: ANCHOR_OK of the
        # freshly drawn pieces.
        valid3 = jnp.where(
            d[:, None, None], ANCHOR_OK[new_state.piece_ids], valid3
        )

    obs = observe(new_state, valid3)
    done_flag = game_over_now
    return StepOutput(new_state, obs, reward, done_flag, info)
