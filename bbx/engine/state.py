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

from .kernel import empty_boards
from .solvability import (
    board_bits,
    solvable_disjoint_bits,
    solvable_exact_bits,
    valid3_bits,
)
from .tables import NUM_PIECE_TYPES, PIECES_PER_TURN

MAX_REGEN_ATTEMPTS = 100  # reference cap, `engine.py:161`


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


def _verdict_flat(
    fbits: jnp.ndarray,
    fids: jnp.ndarray,
    fneed: jnp.ndarray,
    ke: int,
) -> jnp.ndarray:
    """Exact solvability verdict for a flat batch of candidate draws.

    Two tiers on bitboards (see `bbx.engine.solvability`): the disjoint fast
    path runs at full width (accepts ~64% of draws), and the exhaustive
    shift-OR search runs over [ke]-slot compacted buffers for the rest.
    Both tiers are sound, so `fast | exact` equals the reference predicate
    (`/root/reference/src/game/engine.py:174-238`).  The clear1/certain-
    reject screens that round 2 ran between them cost more than the
    shift-OR exact search itself (tier_micro2: ~5 ms of screens guarding a
    ~2 ms exact pass at the same width), so the residual goes straight to
    the exact tier.

    Args:
      fbits: [M, 2] uint32 bitboards.
      fids: [M, 3] int32 candidate draws.
      fneed: [M] bool — slots holding a real candidate.
      ke: exact-buffer width (>= typical residual demand; a demand spike
        just re-runs the compacted pass).
    Returns:
      [M] bool — solvable, False wherever ~fneed.
    """
    v3 = valid3_bits(fbits, fids)
    fast = solvable_disjoint_bits(fbits, fids, v3) & fneed
    todo0 = fneed & ~fast

    def compact(mask, k):
        cum = jnp.cumsum(mask.astype(jnp.int32))
        idx = jnp.searchsorted(
            cum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        live = jnp.arange(k) < jnp.minimum(cum[-1], k)
        return idx, live

    def exact_pass(carry):
        ok, todo = carry
        idx, live = compact(todo, ke)
        res = solvable_exact_bits(fbits[idx], fids[idx], v3[idx]) & live
        ok = ok.at[idx].set(res | ok[idx])
        todo = todo.at[idx].set(False)
        return ok, todo

    ok, _ = jax.lax.while_loop(
        lambda c: jnp.any(c[1]), exact_pass, (fast, todo0)
    )
    return ok


def _event_draws(ekeys: jnp.ndarray, j0: jnp.ndarray, count: int):
    """`count` iid piece triples per event key, attempt-indexed.

    Draw j of an event is `_draw(fold_in(event_key, j))`, so any number of
    attempts can be generated speculatively, and later rounds continue the
    same per-lane sequence from attempt `j0`.

    Args:
      ekeys: [K] event keys.
      j0: [K] int32 first attempt index per lane.
      count: attempts per lane (static).
    Returns:
      [K, count, 3] int32 piece ids.
    """
    dk = jax.vmap(
        lambda k, j: jax.vmap(lambda t: jr.fold_in(k, j + t))(
            jnp.arange(count, dtype=jnp.int32)
        )
    )(ekeys, j0)
    return _draw(dk.reshape(-1)).reshape(-1, count, PIECES_PER_TURN)


_TAIL_DRAWS = 4  # speculative attempts per tail round for stuck lanes


def regen_pieces(
    board: jnp.ndarray,
    piece_ids: jnp.ndarray,
    rng: jnp.ndarray,
    need: jnp.ndarray,
):
    """Redraw piece triples until solvable, for the lanes in `need`.

    Faithful to `engine._generate_new_pieces` (`engine.py:155-172`): up to
    `MAX_REGEN_ATTEMPTS` iid draws per lane, the first solvable draw wins,
    and if none passes the last draw is kept (the game then ends naturally).

    Attempt j of a regen event is `_draw(fold_in(event_key, j))`, so "first
    solvable wins" over the attempt index is distributionally identical to
    the reference's sequential retry, while any number of attempts can be
    drawn and verdicted together.

    Cost shape (measured on TPU, the op trace in RESULTS.md): verdict cost
    is proportional to *verdict slots*, so every buffer is sized to its
    live demand.  A draw is solvable w.p. ~0.9, so the main round spends
    exactly ONE draw per needy lane (speculating more multiplies the
    dominant cost for a ~10% case); the rare stuck lanes move to a wide
    tail round (`_TAIL_DRAWS` speculative attempts each), and stragglers
    beyond that drain through a fixed 64-slot loop instead of paying
    fleet-proportional widths round after round.

    Args:
      board: [N, 8, 8] uint8 (fixed during the retry loop).
      piece_ids: [N, 3] current ids (returned untouched where ~need).
      rng: [N] typed keys.
      need: [N] bool.
    Returns:
      (new_piece_ids [N,3], new_rng [N]).
    """
    n = board.shape[0]
    bits = board_bits(board)  # [N, 2] u32, fixed during the retry loop

    # One rng advance per regen event; attempts come from the event key.
    split = jax.vmap(lambda k: jr.split(k, 2))(rng)
    rng = jnp.where(need, split[:, 0], rng)
    ekey = split[:, 1]

    def compact(mask, k):
        """Indices of the first k True lanes via cumsum + searchsorted.

        `searchsorted(cumsum(mask), j+1)` is the position of the j-th True
        lane, or the out-of-bounds sentinel N when fewer exist: gathers
        through the sentinel clamp produce garbage masked off by `live`,
        and scatters through it are dropped by XLA's out-of-bounds rule.
        """
        cum = jnp.cumsum(mask.astype(jnp.int32))
        idx = jnp.searchsorted(
            cum, jnp.arange(1, k + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        live = jnp.arange(k) < jnp.minimum(cum[-1], k)
        return idx, live

    def spec_round(carry, r, s, ke):
        """One round over a [r]-lane buffer, s attempts per lane.

        Gathered lanes draw attempts [j0, j0+s), verdict them all in one
        flat [r*s] pass, and take their first solvable draw; lanes with no
        solvable draw keep the last allowed one (so a lane hitting the
        attempt cap holds draw #MAX-1, engine.py:170-172) and stay in
        `todo` unless capped.

        The exact-tier buffer (ke) inside the verdict is sized by the
        caller to measured demand, not to worst case: a demand spike just
        re-runs the compacted pass.
        """
        ids, todo, attempts = carry
        idx, live = compact(todo, r)
        j0 = attempts[idx]
        draws = _event_draws(ekey[idx], j0, s)           # [r, s, 3]
        allowed = (j0[:, None] + jnp.arange(s)) < MAX_REGEN_ATTEMPTS
        if s == 1:
            fbits = bits[idx]
        else:
            fbits = jnp.repeat(bits[idx], s, axis=0)
        fneed = jnp.repeat(live, s) & allowed.reshape(-1)
        m = r * s
        ok = _verdict_flat(
            fbits, draws.reshape(m, PIECES_PER_TURN), fneed, ke=ke,
        ).reshape(r, s)
        any_ok = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)
        last_allowed = jnp.clip(MAX_REGEN_ATTEMPTS - 1 - j0, 0, s - 1)
        pick = jnp.where(any_ok, first, last_allowed)
        chosen = jnp.take_along_axis(draws, pick[:, None, None], axis=1)[:, 0]
        ids = ids.at[idx].set(jnp.where(live[:, None], chosen, ids[idx]))
        attempts = attempts.at[idx].add(jnp.where(live, s, 0))
        still = live & ~any_ok & (j0 + s < MAX_REGEN_ATTEMPTS)
        todo = todo.at[idx].set(still)
        return ids, todo, attempts

    # Main round: ONE draw per needy lane.  Needy lanes are ~N/3 per step
    # under the all-used cadence (measured 0.29*N, scripts_dev/
    # regen_stats.py), so n//2 has slack; if more lanes need service
    # (sum(need) > r1, e.g. lockstep regen bursts right after a fleet
    # reset), the main loop runs again for the unserved cohort — per-lane
    # attempt counters keep mixed cohorts correct.  Measured tier demand
    # under random play: ~36% of draws miss the disjoint fast path and go
    # to the exact tier, so its buffer gets 3/8 of the round width.
    r1 = n if n <= 32 else max(32, n // 2)
    ke1 = max(32, (3 * r1) // 8)

    carry = (piece_ids, need, jnp.zeros(n, jnp.int32))
    carry = spec_round(carry, r1, 1, ke1)
    carry = jax.lax.while_loop(
        lambda c: jnp.any(c[1] & (c[2] == 0)),
        lambda c: spec_round(c, r1, 1, ke1),
        carry,
    )

    # Tail: lanes whose first draw failed (~18% of needy, concentrated on
    # hard boards with correlated low acceptance — the worst lane needs
    # ~20 draws) burn _TAIL_DRAWS speculative attempts per round.  Hard
    # boards fail the disjoint tier more often, so the exact buffer is
    # proportionally larger here (s*r/2 slots vs 3r/8 in the main round).
    #
    # Demand sizing: the first wave is ~6% of the fleet and is served by
    # one round at `rt` width, but later waves shrink geometrically while
    # their round count grows with fleet width (the worst lane over 32k
    # envs needs more draws than over 1k).  Those straggler rounds run in
    # a second loop over a fixed 64-slot buffer — sized from live demand,
    # not fleet width — so a 16-32k fleet stops paying full-width passes
    # for a handful of hard lanes.  (A `lax.switch` over bucket widths
    # inside one while body both trips an XLA cycle-detection crash and
    # compiles pathologically; two fixed-width loops capture the win.)
    rt = n if n <= 64 else max(64, n // 16)
    mt = rt * _TAIL_DRAWS
    if rt > 64:
        carry = jax.lax.while_loop(
            lambda c: jnp.sum(c[1].astype(jnp.int32)) > 64,
            lambda c: spec_round(c, rt, _TAIL_DRAWS, max(32, mt // 2)),
            carry,
        )
        # Stragglers are hard boards with ~0.5 per-draw acceptance, so 8
        # speculative draws clear ~99.6% of them per round — the 512-slot
        # verdict is still ~8x narrower than one fleet-width tail pass.
        ids, _, _ = jax.lax.while_loop(
            lambda c: jnp.any(c[1]),
            lambda c: spec_round(c, 64, 8, 256),
            carry,
        )
    else:
        ids, _, _ = jax.lax.while_loop(
            lambda c: jnp.any(c[1]),
            lambda c: spec_round(c, rt, _TAIL_DRAWS, max(32, mt // 2)),
            carry,
        )
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
