"""Fused-chunk cost split: full regen vs unchecked draw vs disjoint-only."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr

import importlib
S = importlib.import_module("bbx.engine.state")
St = importlib.import_module("bbx.engine.step")
from bbx.engine.state import make_env_keys, reset, _draw
from bbx.engine.step import observe
from bbx.env.vector import sample_valid_actions_device
from bbx.engine.solvability import solvable_disjoint
from bbx.engine import kernel as K

N = int(os.environ.get("N", 4096))
CHUNK = 32


def make_chunk(step_fn):
    @jax.jit
    def run_chunk(state, key):
        def body(state, key_t):
            actions = sample_valid_actions_device(key_t, observe(state)["action_mask"])
            out = step_fn(state, actions)
            return out.state, out.reward.sum()
        ks = jr.split(key, CHUNK)
        state, r = jax.lax.scan(body, state, ks)
        return state, r.sum()
    return run_chunk


def bench_chunk(name, regen_impl):
    orig = S.regen_pieces
    S.regen_pieces = regen_impl
    St.regen_pieces = regen_impl
    try:
        keys = make_env_keys(0, N)
        state = jax.jit(reset)(keys)
        chunk = make_chunk(lambda s, a: St.step(s, a, auto_reset=True))
        state, _ = chunk(state, jr.key(1))  # compile + warm into mid-game
        jax.block_until_ready(state)
        t0 = time.time()
        iters = 5
        for i in range(iters):
            state, r = chunk(state, jr.key(2 + i))
        jax.block_until_ready(state)
        dt = (time.time() - t0) / iters / CHUNK
        print(f"{name:36s} {dt*1e3:8.2f} ms/step   {N/dt:12,.0f} steps/s")
    finally:
        S.regen_pieces = orig
        St.regen_pieces = orig


def regen_none(board, ids, rng, need):
    split = jax.vmap(lambda k: jr.split(k, 2))(rng)
    new_rng = jnp.where(need, split[:, 0], rng)
    draw = _draw(split[:, 1])
    return jnp.where(need[:, None], draw, ids), new_rng


def regen_disjoint_only(board, ids, rng, need):
    all_valid = K.valid_anchors_all_pieces(board)
    def cond(c):
        att, _i, acc, _r = c
        return (att < 100) & jnp.any(~acc)
    def body(c):
        att, ids, acc, rng = c
        pend = ~acc
        split = jax.vmap(lambda k: jr.split(k, 2))(rng)
        new_rng = jnp.where(pend, split[:, 0], rng)
        draw = _draw(split[:, 1])
        ids = jnp.where(pend[:, None], draw, ids)
        v3 = K.gather_piece_validity(all_valid, ids)
        ok = solvable_disjoint(v3, ids)
        acc = acc | (pend & ok)
        return att + 1, ids, acc, new_rng
    _, ids, _, rng = jax.lax.while_loop(cond, body, (jnp.int32(0), ids, ~need, rng))
    return ids, rng


print("devices:", jax.devices())
bench_chunk("A full (current)", S.regen_pieces)
if os.environ.get("BBX_ONLY_A") != "1":
    bench_chunk("B unchecked draw", regen_none)
if os.environ.get("BBX_ONLY_A") != "1":
    bench_chunk("C disjoint-only loop", regen_disjoint_only)
