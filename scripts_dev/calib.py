"""Calibrate the scan-bench harness: trivial body vs real ops, varying REPS."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine import kernel as K

def bench(name, fn, reps):
    @jax.jit
    def many():
        def body(c, i):
            out = fn(i)
            return c, jax.tree.map(lambda x: x.sum(), out)
        _, outs = jax.lax.scan(body, 0, jnp.arange(reps))
        return outs
    out = many(); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = many()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3 / reps
    print(f"{name:44s} reps={reps:3d}  {dt*1e3:8.3f} ms/iter")

x = jnp.ones((8, 8), jnp.float32)
bench("trivial add", lambda i: x + i, 16)
bench("trivial add", lambda i: x + i, 128)

b4 = (jr.uniform(jr.key(0), (4096, 8, 8)) < 0.45).astype(jnp.uint8)
b16 = (jr.uniform(jr.key(0), (16384, 8, 8)) < 0.45).astype(jnp.uint8)
bench("valid_anchors 4096", lambda i: K.valid_anchors_all_pieces(b4 ^ (i % 2).astype(jnp.uint8)), 16)
bench("valid_anchors 4096", lambda i: K.valid_anchors_all_pieces(b4 ^ (i % 2).astype(jnp.uint8)), 64)
bench("valid_anchors 16384", lambda i: K.valid_anchors_all_pieces(b16 ^ (i % 2).astype(jnp.uint8)), 64)
