"""Afterstate policy/value network — the TPU-native model family the game's
structure asks for.

Block Blast placements are DETERMINISTIC: place + simultaneous row/col
clear + score involve no randomness (only the post-turn piece regeneration
draws RNG).  A policy must therefore rank 192 afterstates — and the flat
CNN topology the reference uses (`/root/reference/src/models/network.py:
33-271`: one trunk on the current state, a 192-way linear head) has to
*discover* the placement geometry inside its weights.  Empirically it never
does: across every training recipe the flat policy plateaus at ~1.5-2k
while a 1-ply value search over the same checkpoints plays 5-7k (RESULTS
§2,§4) — the ranking is representable by afterstate evaluation but not
(practically) by a flat head.

This module builds the ranking INTO the architecture, the classic
afterstate-value formulation (Sutton & Barto §6.8, long standard for
placement games): the forward pass

  1. expands the observation into all 192 post-move boards with a fixed,
     parameter-free tensor map (shift -> union -> simultaneous clears —
     *pure arithmetic on the observation*, no environment calls, no RNG,
     no reward oracle, no value bootstrap);
  2. scores every candidate afterboard with one shared learned evaluator
     (small CNN + per-move scalar features + a remaining-pieces context);
  3. returns those scores as the 192 policy logits (masked), plus a value
     head on the current state.

The result is an ordinary feed-forward policy network — same
`(board, pieces, mask, train) -> (logits, value)` contract as
`BlockBlastNetwork`, trained by ordinary PPO, greedily decoded at eval
with no search — whose hypothesis class contains the afterstate ranking
that the game rewards.  On TPU the expansion is one gather and the
evaluator runs as a single [B*192] fused batch on the MXU; the reference's
per-move Python engine could never have afforded an architecture that
re-evaluates 192 boards per forward.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .network import kaiming_uniform

BOARD = 8
NUM_SLOTS = 3
NUM_ANCHORS = 64
NUM_ACTIONS = NUM_SLOTS * NUM_ANCHORS


def afterstate_planes(board: jnp.ndarray, pieces: jnp.ndarray):
    """Expand (board, pieces) into all 192 candidate afterstates.

    Pure tensor arithmetic on the observation — the model-side mirror of the
    engine's `_move_core` placement+clear (`bbx/engine/step.py:89-140`,
    asserted equivalent in `tests/test_afterstate.py`).

    Args:
      board: [B, 8, 8] float 0/1.
      pieces: [B, 3, 8, 8] float 0/1 piece masks anchored at the top-left
        (already zeroed for used slots, as `observe` emits them).

    Returns:
      after: [B, 192, 8, 8] post-clear afterboards (action = slot*64+r*8+c).
      placed: [B, 192, 8, 8] the shifted piece occupancy alone.
      lines: [B, 192] number of rows+cols cleared by the move.
      overlap: [B, 192] bool — placement collides with existing blocks or
        falls out of bounds (cells lost by the shift).  The caller's action
        mask already encodes this; returned for the differential tests.
    """
    b = board.shape[0]
    # All 64 anchor shifts of each piece plane: pad 7 zeros before each
    # spatial dim, then window at (7-r, 7-c).  Static slices — one fused
    # gather under XLA, no dynamic shapes.
    padded = jnp.pad(pieces, ((0, 0), (0, 0), (7, 0), (7, 0)))
    shifted = jnp.stack(
        [
            padded[:, :, 7 - r : 15 - r, 7 - c : 15 - c]
            for r in range(BOARD)
            for c in range(BOARD)
        ],
        axis=2,
    )  # [B, 3, 64, 8, 8]
    placed = shifted.reshape(b, NUM_ACTIONS, BOARD, BOARD)

    nblocks = jnp.sum(pieces, axis=(2, 3))                      # [B, 3]
    kept = jnp.sum(placed, axis=(2, 3))                         # [B, 192]
    lost = kept < jnp.repeat(nblocks, NUM_ANCHORS, axis=1)      # out of bounds

    board_e = board[:, None]                                    # [B, 1, 8, 8]
    collide = jnp.sum(placed * board_e, axis=(2, 3)) > 0
    overlap = collide | lost

    pre = jnp.clip(board_e + placed, 0.0, 1.0)                  # [B,192,8,8]
    row_full = jnp.all(pre > 0.5, axis=3)                       # [B, 192, 8]
    col_full = jnp.all(pre > 0.5, axis=2)                       # [B, 192, 8]
    keep = ~(row_full[:, :, :, None] | col_full[:, :, None, :])
    after = pre * keep.astype(pre.dtype)
    lines = (
        jnp.sum(row_full, axis=2) + jnp.sum(col_full, axis=2)
    ).astype(jnp.float32)
    return after, placed, lines, overlap


class _Evaluator(nn.Module):
    """Shared per-afterstate scorer: small CNN + scalar features + context."""

    channels: Sequence[int] = (24, 24)
    hidden: int = 96
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, boards, feats):
        # boards: [M, 8, 8, C_in]; feats: [M, F]
        x = boards.astype(self.dtype)
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=kaiming_uniform)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, feats.astype(self.dtype)], axis=-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                             kernel_init=kaiming_uniform)(x))
        score = nn.Dense(1, dtype=self.dtype,
                         kernel_init=kaiming_uniform)(x)[:, 0]
        return score


class AfterstateNetwork(nn.Module):
    """Policy = learned evaluation of each action's deterministic afterstate.

    Same call contract as `BlockBlastNetwork` (`bbx/models/network.py:73`),
    so PPO, the trainer, checkpoints, eval, and the GUI drive it unchanged
    via `network.type: afterstate` in the config.
    """

    eval_channels: Sequence[int] = (24, 24)
    eval_hidden: int = 96
    ctx_dim: int = 32
    value_channels: Sequence[int] = (48, 64)
    value_hidden: int = 256
    action_space_size: int = NUM_ACTIONS
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        board: jnp.ndarray,
        pieces: jnp.ndarray,
        action_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del train  # no BatchNorm/dropout in this family: rollouts and
        # updates see identical functions, and scores stay comparable
        # across the [B*192] evaluation batch.
        b = board.shape[0]
        after, placed, lines, _ = afterstate_planes(
            board.astype(jnp.float32), pieces.astype(jnp.float32)
        )

        # Remaining-pieces context per slot, via the set-sum trick: embed
        # each drawn piece once, context of slot s = total - e_s (the two
        # pieces still in hand after this move).
        flat_pieces = pieces.reshape(b, NUM_SLOTS, BOARD * BOARD)
        e = nn.Dense(self.ctx_dim, dtype=self.dtype,
                     kernel_init=kaiming_uniform)(
            flat_pieces.astype(self.dtype))                  # [B, 3, D]
        ctx = jnp.sum(e, axis=1, keepdims=True) - e          # [B, 3, D]
        ctx = jnp.repeat(ctx, NUM_ANCHORS, axis=1)           # [B, 192, D]

        nblocks = jnp.sum(placed, axis=(2, 3))               # [B, 192]
        feats = jnp.concatenate(
            [
                lines[..., None] / 4.0,
                (lines[..., None] > 0).astype(jnp.float32),
                nblocks[..., None] / 5.0,
                ctx.astype(jnp.float32),
            ],
            axis=-1,
        )                                                    # [B, 192, F]

        stack = jnp.stack([after, placed], axis=-1)          # [B,192,8,8,2]
        m = b * NUM_ACTIONS
        evaluator = nn.remat(_Evaluator)(
            self.eval_channels, self.eval_hidden, self.dtype
        )
        scores = evaluator(
            stack.reshape(m, BOARD, BOARD, 2),
            feats.reshape(m, feats.shape[-1]),
        )
        logits = scores.reshape(b, NUM_ACTIONS).astype(jnp.float32)

        # Value head on the current state (standard small trunk).
        x = jnp.concatenate(
            [board[..., None], jnp.transpose(pieces, (0, 2, 3, 1))], axis=-1
        ).astype(self.dtype)
        for ch in self.value_channels:
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                                kernel_init=kaiming_uniform)(x))
        x = x.reshape(b, -1)
        x = nn.relu(nn.Dense(self.value_hidden, dtype=self.dtype,
                             kernel_init=kaiming_uniform)(x))
        value = nn.Dense(1, dtype=self.dtype,
                         kernel_init=kaiming_uniform)(x)[:, 0]
        value = value.astype(jnp.float32)

        if action_mask is not None:
            from .distributions import mask_logits
            logits = mask_logits(logits, action_mask)
        return logits, value
