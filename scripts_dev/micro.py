"""Microbench: isolate which primitive is slow on the TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine.tables import PAIR_CONFLICT, NO_CONFLICT_BF16, OCC_T_BF16, PLACEMENT_BF16

N = 4096
k = jr.key(0)
board = (jr.uniform(k, (N, 64)) < 0.3).astype(jnp.bfloat16)
p0 = jr.randint(jr.key(1), (N,), 0, 37)
p1 = jr.randint(jr.key(2), (N,), 0, 37)

def bench(fn, *args, iters=20, name=""):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.time()-t0)/iters*1e3:8.3f} ms")

# 1. the big validity matmul
bench(lambda b: jax.lax.dot_general(b, OCC_T_BF16, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32),
      board, name="matmul [4096,64]@[64,2368] bf16->f32")

# 2. gather from pair-conflict table
bench(lambda a, b: PAIR_CONFLICT[a, b], p0, p1, name="gather PAIR_CONFLICT[p0,p1] [N,64,64] bool")
bench(lambda a, b: NO_CONFLICT_BF16[a, b], p0, p1, name="gather NO_CONFLICT_BF16[p0,p1]")

# 3. one-hot matmul alternative for the same gather
NC_FLAT = NO_CONFLICT_BF16.reshape(37 * 37, 64 * 64)
def onehot_gather(a, b):
    oh = jax.nn.one_hot(a * 37 + b, 37 * 37, dtype=jnp.bfloat16)  # [N,1369]
    return jax.lax.dot_general(oh, NC_FLAT, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).reshape(-1, 64, 64)
bench(onehot_gather, p0, p1, name="one-hot matmul gather [N,1369]@[1369,4096]")

# 4. batched small matmul [N,64,64]@[N,64,64]
m = (jr.uniform(jr.key(3), (N, 64, 64)) < 0.5).astype(jnp.bfloat16)
nc = onehot_gather(p0, p1).astype(jnp.bfloat16)
bench(lambda x, y: jax.lax.dot_general(x, y, (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32),
      m, nc, name="batched dot [N,64,64]@[N,64,64]")

# 5. gather PLACEMENT_BF16[piece] ([37,64,64] table)
bench(lambda p: PLACEMENT_BF16[p], p0, name="gather PLACEMENT_BF16[p] small table")
P_FLAT = PLACEMENT_BF16.reshape(37, 64 * 64)
bench(lambda p: jax.nn.one_hot(p, 37, dtype=jnp.bfloat16) @ P_FLAT,
      p0, name="one-hot matmul PLACEMENT [N,37]@[37,4096]")

# 6. argsort 4096 (compaction cost)
mask = jr.uniform(jr.key(4), (N,)) < 0.05
bench(lambda m: jnp.argsort(~m)[:128], mask, name="argsort(4096)[:128]")
bench(lambda m: jax.lax.top_k(m.astype(jnp.float32), 128)[1], mask, name="top_k(4096,128)")

# 7. vmapped rng split x4096
keys = jr.split(k, N)
bench(lambda ks: jax.vmap(lambda q: jr.split(q, 2))(ks), keys, name="vmap split 4096 keys")
bench(lambda ks: jax.vmap(lambda q: jr.randint(q, (3,), 0, 37))(ks), keys,
      name="vmap randint 4096x3")
