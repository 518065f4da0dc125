"""Fused cost of solvable_full at various batch sizes on TPU (scan amortizes dispatch)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine.solvability import solvable_full, solvable_disjoint
from bbx.engine import kernel as K

REPS = 20

for n in (32, 128, 512):
    boards = (jr.uniform(jr.key(0), (n, 8, 8)) < 0.4).astype(jnp.uint8)
    ids = jr.randint(jr.key(1), (n, 3), 0, 37)

    @jax.jit
    def many(boards, ids):
        def body(acc, k):
            out = solvable_full(boards ^ (acc[:, None, None] & 0), ids, a1_block=64)
            return (acc ^ out.astype(jnp.uint8)).astype(jnp.uint8), out.sum()
        acc, outs = jax.lax.scan(body, jnp.zeros(n, jnp.uint8), jnp.arange(REPS))
        return outs.sum()

    out = many(boards, ids); jax.block_until_ready(out)
    t0 = time.time()
    out = many(boards, ids); jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"solvable_full n={n:4d}: {dt*1e3:7.2f} ms fused")

# disjoint fused at full batch for reference
for n in (4096, 16384):
    boards = (jr.uniform(jr.key(0), (n, 8, 8)) < 0.4).astype(jnp.uint8)
    ids = jr.randint(jr.key(1), (n, 3), 0, 37)

    @jax.jit
    def manyd(boards, ids):
        av = K.valid_anchors_all_pieces(boards)
        def body(acc, k):
            v3 = K.gather_piece_validity(av, ids + acc[:, :1] * 0)
            out = solvable_disjoint(v3, ids)
            return acc, out.sum()
        _, outs = jax.lax.scan(body, ids, jnp.arange(REPS))
        return outs.sum()

    out = manyd(boards, ids); jax.block_until_ready(out)
    t0 = time.time()
    out = manyd(boards, ids); jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"solvable_disjoint n={n:6d}: {dt*1e3:7.2f} ms fused")
