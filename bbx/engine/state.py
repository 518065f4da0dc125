"""Environment state pytree, piece generation, and reset.

`EnvState` is a batch-first struct of arrays: every field carries a leading
``[N]`` batch dimension and lives on device.  The reference keeps this state
in per-env Python objects (`/root/reference/src/game/engine.py:107-125`); here
the whole fleet of environments is a single pytree that a jitted step
function transforms in lockstep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
from flax import struct

from .kernel import empty_boards, gather_piece_validity, valid_anchors_all_pieces
from .solvability import solvable, solvable_disjoint
from .tables import ANCHOR_OK, NUM_PIECE_TYPES, PIECES_PER_TURN

MAX_REGEN_ATTEMPTS = 100  # reference cap, `engine.py:161`

# Drain-tier buffer sizes for the compacted regen retry loop (see
# `regen_pieces`): big rounds drain the bulk of pending lanes, small rounds
# serve the stragglers.  Module-level so perf sweeps can patch them.
_TIER_K1 = 128
_TIER_K2 = 32


@struct.dataclass
class EnvState:
    """Batched Block Blast game state ([N] leading dim everywhere).

    Mirrors `GameState` + engine statistics (`engine.py:44-78,107-125`) plus
    the env-level reward-shaping trackers (`block_blast_env.py:100-102`) and
    on-device episode accumulators (replacing the host-side bookkeeping in
    `wrappers.py:93-108`).
    """

    board: jnp.ndarray        # [N, 8, 8] uint8
    piece_ids: jnp.ndarray    # [N, 3] int32
    used: jnp.ndarray         # [N, 3] bool
    score: jnp.ndarray        # [N] int32
    streak: jnp.ndarray       # [N] int32 — consecutive clearing moves (combo_count)
    moves: jnp.ndarray        # [N] int32
    lines_total: jnp.ndarray  # [N] int32
    max_streak: jnp.ndarray   # [N] int32
    blocks_total: jnp.ndarray # [N] int32 — total blocks placed
    done: jnp.ndarray         # [N] bool — game over
    prev_holes: jnp.ndarray   # [N] int32 — reward-shaping tracker
    prev_center: jnp.ndarray  # [N] f32  — reward-shaping tracker
    ep_return: jnp.ndarray    # [N] f32  — running episode reward
    ep_len: jnp.ndarray       # [N] int32
    rng: jnp.ndarray          # [N] typed PRNG keys (per-env streams)

    @property
    def num_envs(self) -> int:
        return self.board.shape[0]


def _draw(keys: jnp.ndarray) -> jnp.ndarray:
    """One uniform-iid triple of piece ids per key ([N] keys -> [N, 3] i32).

    Distributionally matches `get_random_pieces` (`pieces.py:350-355`:
    `rng.choice(37, size=3, replace=True)`), using counter-based threefry
    streams instead of NumPy PCG64.
    """
    return jax.vmap(
        lambda k: jr.randint(k, (PIECES_PER_TURN,), 0, NUM_PIECE_TYPES)
    )(keys)


def fresh_pieces(keys: jnp.ndarray) -> jnp.ndarray:
    """Piece draw for an *empty* board.

    On an empty 8x8 board every triple of the 37 shapes admits three
    pairwise-disjoint placements (verified exhaustively over all 37^3 triples
    in `tests/test_solvability.py`), so the reference's accept/retry loop
    always accepts the first draw — a single unchecked draw is behaviorally
    identical and keeps the auto-reset path free of while-loops.
    """
    return _draw(keys)


def regen_pieces(
    board: jnp.ndarray,
    all_valid: jnp.ndarray,
    piece_ids: jnp.ndarray,
    rng: jnp.ndarray,
    need: jnp.ndarray,
):
    """Redraw piece triples until solvable, for the lanes in `need`.

    Faithful to `engine._generate_new_pieces` (`engine.py:155-172`): up to
    `MAX_REGEN_ATTEMPTS` draws per lane; if none passes the solvability check
    the last draw is kept (the game then ends naturally).

    Structure is chosen for the batched lockstep setting, where ~N/3 lanes
    regen every step but only a few percent of draws need more than the
    cheap screens:
      * Pass 1 (full batch): one draw per needy lane + the disjoint fast
        path.  Accepts ~2/3 of lanes in one shot with two batched matmuls.
      * Retry loops (compacted, two tiers): surviving lanes are gathered
        into a fixed small buffer (128 lanes for the bulk, 32 for the
        stragglers); each round gives the gathered candidates their exact
        verdict, redraws the rejected, and disjoint-screens the fresh draws
        in the same round — per-round cost is bounded by the buffer size,
        never the fleet size, and buffers stay small enough that the
        verdict working set fits VMEM.

    Per-lane results are independent of other lanes' retry counts: a lane's
    ids/rng are only touched on its own draws (batch-of-N == N batches-of-1).

    Args:
      board: [N, 8, 8] uint8 (fixed during the retry loop).
      all_valid: [N, 37, 64] — validity of all pieces on `board` (hoisted).
      piece_ids: [N, 3] current ids (returned untouched where ~need).
      rng: [N] typed keys.
      need: [N] bool.
    Returns:
      (new_piece_ids [N,3], new_rng [N]).
    """
    n = board.shape[0]

    # ---- Pass 1: one draw + disjoint screen, full batch ----
    split = jax.vmap(lambda k: jr.split(k, 2))(rng)
    rng = jnp.where(need, split[:, 0], rng)
    draw = _draw(split[:, 1])
    ids = jnp.where(need[:, None], draw, piece_ids)
    v3 = gather_piece_validity(all_valid, ids)
    fast = solvable_disjoint(v3, ids)
    pending = need & ~fast          # candidate drawn, verdict unknown
    attempts = need.astype(jnp.int32)

    def compact_indices(mask, k):
        """Indices of the first k True lanes via cumsum + searchsorted.

        `searchsorted(cumsum(mask), j+1)` is the position of the j-th True
        lane, or the out-of-bounds sentinel N when fewer exist: gathers
        through the sentinel clamp (garbage lanes, masked off by `live`) and
        scatters through it are dropped by XLA's out-of-bounds rule, so
        padded slots can never corrupt real lanes.  k·log(N) binary-search
        work — no sort network (top_k) and no colliding scatter (which TPU
        executes serially) on the per-round hot path.
        """
        cum = jnp.cumsum(mask.astype(jnp.int32))
        idx = jnp.searchsorted(
            cum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        live = jnp.arange(k) < jnp.minimum(cum[-1], k)
        return idx, live

    def round_body(k):
        """One compacted verdict/redraw round over a [k]-lane buffer.

        Each round gives the gathered candidates their exact verdict,
        redraws the rejected, and — crucially — disjoint-screens the fresh
        draw in the same round: a redraw only stays pending when it needs
        the (expensive) exact verdict, so the loop length tracks the number
        of exact verdicts per lane (~0.35/draw), not the number of draws.
        """

        def body(carry):
            ids, rng, pending, attempts = carry
            idx, live = compact_indices(pending, k)
            sids = ids[idx]
            sboard = board[idx]
            svalid = all_valid[idx]
            ok = solvable(sboard, svalid, sids, live) & live
            rejected = live & ~ok
            retry = rejected & (attempts[idx] < MAX_REGEN_ATTEMPTS)
            # exhausted lanes keep their last draw — engine.py:170-172

            sp = jax.vmap(lambda q: jr.split(q, 2))(rng[idx])
            new_rng_k = jnp.where(retry, sp[:, 0], rng[idx])
            draw_k = _draw(sp[:, 1])
            ids_k = jnp.where(retry[:, None], draw_k, sids)
            # Cheap screen of the fresh draw now, not next round.
            fast_k = solvable_disjoint(
                gather_piece_validity(svalid, ids_k), ids_k
            )

            ids = ids.at[idx].set(ids_k)
            rng = rng.at[idx].set(new_rng_k)
            pending = pending.at[idx].set(retry & ~fast_k)
            attempts = attempts.at[idx].add(retry.astype(jnp.int32))
            return ids, rng, pending, attempts

        return body

    def cond_any(carry):
        return jnp.any(carry[2])

    if n <= 32:
        ids, rng, _, _ = jax.lax.while_loop(
            cond_any, round_body(n), (ids, rng, pending, attempts)
        )
        return ids, rng

    # Two tiers: big rounds drain the bulk of pending lanes, small rounds
    # serve the straggler lanes that chain many exact verdicts near game
    # over.  Sizes trade round count against per-round working set.
    k1 = min(_TIER_K1, n)
    k2 = min(_TIER_K2, n)

    def cond_big(carry):
        return jnp.sum(carry[2]) > k2

    carry = (ids, rng, pending, attempts)
    carry = jax.lax.while_loop(cond_big, round_body(k1), carry)
    ids, rng, _, _ = jax.lax.while_loop(cond_any, round_body(k2), carry)
    return ids, rng


def reset(rng: jnp.ndarray) -> EnvState:
    """Fresh batch of environments from a batch of per-env keys ([N] keys)."""
    n = rng.shape[0]
    split = jax.vmap(lambda k: jr.split(k, 2))(rng)
    rng, draw_keys = split[:, 0], split[:, 1]
    return EnvState(
        board=empty_boards(n),
        piece_ids=fresh_pieces(draw_keys),
        used=jnp.zeros((n, PIECES_PER_TURN), dtype=bool),
        score=jnp.zeros(n, jnp.int32),
        streak=jnp.zeros(n, jnp.int32),
        moves=jnp.zeros(n, jnp.int32),
        lines_total=jnp.zeros(n, jnp.int32),
        max_streak=jnp.zeros(n, jnp.int32),
        blocks_total=jnp.zeros(n, jnp.int32),
        done=jnp.zeros(n, bool),
        prev_holes=jnp.zeros(n, jnp.int32),
        prev_center=jnp.ones(n, jnp.float32),
        ep_return=jnp.zeros(n, jnp.float32),
        ep_len=jnp.zeros(n, jnp.int32),
        rng=rng,
    )


def from_components(
    board,
    piece_ids,
    used,
    score=None,
    streak=None,
    moves=None,
    lines_total=None,
    max_streak=None,
    blocks_total=None,
    done=None,
    prev_holes=None,
    prev_center=None,
    rng=None,
) -> EnvState:
    """Build a batched EnvState from raw arrays (the `set_state` analogue,
    `engine.py:468-476`).  Unspecified counters default to zero."""
    board = jnp.asarray(board, dtype=jnp.uint8)
    if board.ndim == 2:
        board = board[None]
    n = board.shape[0]

    def arr(x, default, dtype):
        if x is None:
            return jnp.full((n,), default, dtype=dtype)
        return jnp.asarray(x, dtype=dtype).reshape(n)

    piece_ids = jnp.asarray(piece_ids, dtype=jnp.int32).reshape(n, PIECES_PER_TURN)
    used = jnp.asarray(used, dtype=bool).reshape(n, PIECES_PER_TURN)
    if rng is None:
        rng = jr.split(jr.key(0), n)
    return EnvState(
        board=board,
        piece_ids=piece_ids,
        used=used,
        score=arr(score, 0, jnp.int32),
        streak=arr(streak, 0, jnp.int32),
        moves=arr(moves, 0, jnp.int32),
        lines_total=arr(lines_total, 0, jnp.int32),
        max_streak=arr(max_streak, 0, jnp.int32),
        blocks_total=arr(blocks_total, 0, jnp.int32),
        done=arr(done, False, bool),
        prev_holes=arr(prev_holes, 0, jnp.int32),
        prev_center=arr(prev_center, 1.0, jnp.float32),
        ep_return=jnp.zeros(n, jnp.float32),
        ep_len=jnp.zeros(n, jnp.int32),
        rng=rng,
    )


def make_env_keys(seed: int, n: int) -> jnp.ndarray:
    """Per-env key streams from one integer seed (reference seeds env i with
    seed+i, `wrappers.py:39-43`; we fold i into a threefry stream instead)."""
    return jr.split(jr.key(seed), n)
