"""Dev profiling: break the env step into phases and time each on TPU."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr

from bbx.engine.state import make_env_keys, reset, regen_pieces, fresh_pieces
from bbx.engine.step import step, observe
from bbx.engine import kernel as K
from bbx.engine.solvability import (
    board_bits, solvable_disjoint_bits, solvable_exact_bits, valid3_bits,
)
from bbx.env.vector import sample_valid_actions_device

N = int(os.environ.get("N", 4096))
CHUNK = 32

print("devices:", jax.devices())

keys = make_env_keys(0, N)
state = jax.jit(reset)(keys)

# Warm the state to a realistic mid-game distribution: run 64 steps.
@jax.jit
def run_chunk(state, key, with_regen=True):
    def body(state, key_t):
        actions = sample_valid_actions_device(key_t, observe(state)["action_mask"])
        out = step(state, actions, auto_reset=True)
        return out.state, out.reward.sum()
    ks = jr.split(key, CHUNK)
    state, r = jax.lax.scan(body, state, ks)
    return state, r.sum()

t0 = time.time()
state, _ = run_chunk(state, jr.key(1))
jax.block_until_ready(state)
print(f"compile+warm chunk: {time.time()-t0:.1f}s")

def bench(fn, *args, iters=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms")
    return dt

# full chunk
dt = bench(run_chunk, state, jr.key(2), iters=3, name=f"full chunk ({CHUNK} steps)")
print(f"  -> {N*CHUNK/dt:,.0f} env-steps/s")

# Individual phases (single step granularity, jitted separately)
actions = sample_valid_actions_device(jr.key(3), jax.jit(observe)(state)["action_mask"])
jax.block_until_ready(actions)

bench(jax.jit(K.valid_anchors_all_pieces), state.board, name="valid_anchors_all_pieces")
bench(jax.jit(observe), state, name="observe")
bench(jax.jit(functools.partial(step, auto_reset=True)), state, actions, name="one full step")

# regen in isolation: force need on ~1/3 lanes
need = (jnp.arange(N) % 3) == 0
all_valid = jax.jit(K.valid_anchors_all_pieces)(state.board)
bench(jax.jit(regen_pieces), state.board, state.piece_ids, state.rng, need,
      name="regen_pieces (1/3 lanes)")
bench(jax.jit(regen_pieces), state.board, state.piece_ids, state.rng,
      jnp.zeros(N, bool), name="regen_pieces (0 lanes)")

# solvability components (production bitboard path: state._verdict_flat
# feeds solvable_disjoint_bits fast-path, then solvable_exact_bits)
ids = state.piece_ids.astype(jnp.int32)
bits = jax.jit(board_bits)(state.board)
v3 = jax.jit(valid3_bits)(bits, ids)
bench(jax.jit(valid3_bits), bits, ids, name="valid3_bits (all lanes)")
bench(jax.jit(solvable_disjoint_bits), bits, ids, v3,
      name="solvable_disjoint_bits (all lanes)")
bench(jax.jit(solvable_exact_bits), bits[:128], ids[:128], v3[:128],
      name="solvable_exact_bits (128 lanes)")

# step without regen (hack: pass all_used=False by zeroing used)
@jax.jit
def step_no_regen(state, actions):
    # mimic step but regen never triggers: mark one piece unused
    st = state.replace(used=jnp.zeros_like(state.used))
    return step(st, actions, auto_reset=True)
bench(step_no_regen, state, actions, name="step (regen never triggers)")
