"""Bit-exact parity mode: the TPU kernels driven by the reference's RNG.

`ParityEngine` mirrors `GameEngine` (`/root/reference/src/game/engine.py:
81-535`) move-for-move under a shared seed: piece draws come from
`np.random.default_rng(seed).choice(37, size=3, replace=True)` exactly as
`get_random_pieces` does (`pieces.py:350-355`), the accept/retry loop
matches `_generate_new_pieces` (`engine.py:155-172`, cap 100, last draw
kept on exhaustion), and placement / line-clear / scoring mechanics run
through the same jitted tensor kernels as production (`_move_core`).

Production training keeps counter-based threefry draw streams
(distributionally identical); this mode exists so a full seeded episode can
be certified golden against the reference implementation — BASELINE.md
target row 1 — in `tests/test_parity.py`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solvability import (
    board_bits,
    solvable_disjoint_bits,
    solvable_exact_bits,
    valid3_bits,
)
from .state import from_components
from .step import _move_core
from .tables import BOARD_SIZE, NUM_PIECE_TYPES, PIECES_PER_TURN

MAX_REGEN_ATTEMPTS = 100  # engine.py:161


@jax.jit
def _move1(state, action):
    (valid, piece, nblocks, new_board, lines, _rows, _cols, _cleared,
     streak_after, _mult, score_gained, used_after) = _move_core(state, action)
    return valid, nblocks, new_board, lines, streak_after, score_gained, used_after


@jax.jit
def _solvable1(bits, ids):
    v3 = valid3_bits(bits, ids)
    return solvable_disjoint_bits(bits, ids, v3) | solvable_exact_bits(
        bits, ids, v3
    )


@jax.jit
def _mask1(board, ids, used):
    bits = board_bits(board)
    return valid3_bits(bits, ids) & ~used[:, :, None]


class ParityEngine:
    """Single game with reference-identical RNG consumption.

    Exposes the `GameEngine` observables (`engine.py:107-125`): board,
    current piece ids, used flags, score, combo_count (streak), moves_made,
    total_lines_cleared, max_combo, total_blocks_placed, game_over.
    """

    def __init__(self, seed: Optional[int] = None):
        self.reset(seed)

    def reset(self, seed: Optional[int] = None) -> None:
        self.rng = np.random.default_rng(seed)
        self.board = np.zeros((BOARD_SIZE, BOARD_SIZE), np.uint8)
        self.piece_ids = np.zeros(PIECES_PER_TURN, np.int32)
        self.used = np.zeros(PIECES_PER_TURN, bool)
        self.score = 0
        self.combo_count = 0
        self.moves_made = 0
        self.total_lines_cleared = 0
        self.max_combo = 0
        self.total_blocks_placed = 0
        self.game_over = False
        self._generate_new_pieces()
        self._update_game_over()

    # -- internals ----------------------------------------------------------
    def _generate_new_pieces(self) -> None:
        """Reference `_generate_new_pieces` (`engine.py:155-172`): iid draws
        from the PCG64 stream until the exact solvability predicate accepts,
        keeping the last draw after MAX_REGEN_ATTEMPTS failures."""
        bits = board_bits(jnp.asarray(self.board[None]))
        for _ in range(MAX_REGEN_ATTEMPTS):
            ids = self.rng.choice(NUM_PIECE_TYPES, size=PIECES_PER_TURN,
                                  replace=True)
            self.piece_ids = ids.astype(np.int32)
            self.used = np.zeros(PIECES_PER_TURN, bool)
            if bool(_solvable1(bits, jnp.asarray(self.piece_ids[None]))[0]):
                return

    def _update_game_over(self) -> None:
        self.game_over = not bool(np.asarray(self.get_action_mask()).any())

    # -- GameEngine API mirror ------------------------------------------------
    def get_action_mask(self) -> np.ndarray:
        """[3, 8, 8] bool (`engine.get_action_mask`, engine.py:364-380)."""
        m = _mask1(
            jnp.asarray(self.board[None]),
            jnp.asarray(self.piece_ids[None]),
            jnp.asarray(self.used[None]),
        )
        return np.asarray(m[0]).reshape(
            PIECES_PER_TURN, BOARD_SIZE, BOARD_SIZE
        )

    def make_move(self, piece_index: int, row: int, col: int) -> bool:
        """Place a piece; returns success (`engine.make_move`,
        engine.py:390-454)."""
        if self.game_over:
            return False
        state = from_components(
            self.board[None],
            self.piece_ids[None],
            self.used[None],
            score=[self.score],
            streak=[self.combo_count],
        )
        action = piece_index * 64 + row * BOARD_SIZE + col
        valid, nblocks, new_board, lines, streak, gained, used = _move1(
            state, jnp.asarray([action])
        )
        if not bool(valid[0]):
            return False
        self.board = np.asarray(new_board[0], np.uint8)
        self.used = np.asarray(used[0])
        self.score += int(gained[0])
        self.combo_count = int(streak[0])
        self.max_combo = max(self.max_combo, self.combo_count)
        self.moves_made += 1
        self.total_lines_cleared += int(lines[0])
        self.total_blocks_placed += int(nblocks[0])
        if self.used.all():
            self._generate_new_pieces()
        self._update_game_over()
        return True

    def get_valid_moves(self):
        """(piece, row, col) triples with the mask set."""
        mask = self.get_action_mask()
        return [tuple(int(x) for x in idx) for idx in np.argwhere(mask)]
