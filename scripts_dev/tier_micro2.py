"""Per-tier verdict cost at the widths _verdict_flat actually uses (N=16384
fleet -> r1=8192 main round, kp=2458 screen, ke=512 exact)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
import numpy as np
from bbx.engine import solvability as SV

rng = np.random.default_rng(0)


def mk(k):
    board = (rng.random((k, 8, 8)) < 0.45).astype(np.uint8)
    ids = rng.integers(0, 37, (k, 3)).astype(np.int32)
    b = jnp.asarray(board)
    i = jnp.asarray(ids)
    bits = SV.board_bits(b)
    v3 = jax.jit(SV.valid3_bits)(bits, i)
    return b, bits, i, v3


def timeit(name, fn, *args, iters=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt*1e6:9.1f} us")


for k in (8192,):
    b, bits, i, v3 = mk(k)
    timeit(f"valid3_bits       K={k}", jax.jit(SV.valid3_bits), bits, i)
    timeit(f"disjoint_bits     K={k}",
           jax.jit(SV.solvable_disjoint_bits), bits, i, v3)

for k in (2458,):
    b, bits, i, v3 = mk(k)
    cand = jax.jit(SV.clear_candidates)(b, i, v3)
    timeit(f"clear_candidates  K={k}",
           jax.jit(SV.clear_candidates), b, i, v3)
    timeit(f"clear1_bits       K={k}",
           jax.jit(SV.solvable_clear1_bits), bits, i, cand)
    timeit(f"unsolv_certain    K={k}",
           jax.jit(SV.unsolvable_certain), b, i, v3, cand)

for k in (512, 2458):
    b, bits, i, v3 = mk(k)
    timeit(f"exact_bits        K={k}",
           jax.jit(SV.solvable_exact_bits), bits, i, v3)
