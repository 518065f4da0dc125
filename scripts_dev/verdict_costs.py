"""Microbench: per-slot cost of each solvability screen/verdict vs width."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import step, observe
from bbx.engine import kernel as K
from bbx.engine import solvability as SV
from bbx.env.vector import sample_valid_actions_device

N = 16384
keys = make_env_keys(0, N)
state = jax.jit(reset)(keys)

@jax.jit
def warm(state, key):
    def body(state, key_t):
        a = sample_valid_actions_device(key_t, observe(state)["action_mask"])
        return step(state, a, auto_reset=True).state, None
    ks = jr.split(key, 48)
    return jax.lax.scan(body, state, ks)[0]

state = warm(state, jr.key(1))
jax.block_until_ready(state)
board = state.board
ids = state.piece_ids
all_valid = jax.jit(K.valid_anchors_all_pieces)(board)
v3 = jax.jit(K.gather_piece_validity)(all_valid, ids)
cand = jax.jit(SV.clear_candidates)(board, ids, v3)
jax.block_until_ready((v3, cand))

def bench(label, fn, *args, reps=16, iters=3):
    """Run fn in a scan of `reps` inside one jit (amortize dispatch)."""
    @jax.jit
    def many(*a):
        def body(acc, _):
            return acc ^ jnp.any(fn(*a)), None
        return jax.lax.scan(body, jnp.bool_(False), jnp.arange(reps))[0]
    out = many(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(*args)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / iters / reps
    n = args[0].shape[0]
    print(f"{label:34s} w={n:<6d} {per*1e3:8.3f} ms  {per/n*1e6:7.2f} us/slot",
          flush=True)

for w in (128, 512, 2048, 16384):
    b, i3, v, c = board[:w], ids[:w], v3[:w], cand[:w]
    live = jnp.ones(w, bool)
    bench("solvable_disjoint", SV.solvable_disjoint, v, i3)
    bench("clear_candidates", SV.clear_candidates, b, i3, v)
    bench("solvable_clear1", SV.solvable_clear1, b, i3, c)
    bench("unsolvable_certain", SV.unsolvable_certain, b, i3, v, c)
    if w <= 2048:
        bench("solvable_exact", SV.solvable_exact, b, i3, v, live)
    print()
