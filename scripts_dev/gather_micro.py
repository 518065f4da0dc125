"""Micro-bench: table gathers via native indexing vs one-hot matmul on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
import numpy as np
from bbx.engine.tables import PLACE_BITS, ANCHOR_OK, NUM_PIECE_TYPES

N = int(os.environ.get("N", 16384))

# Byte-decomposed PLACE_BITS for the matmul path: [37, 64*2*4] bf16.
pb = np.asarray(PLACE_BITS)  # [37, 64, 2] u32
pb_bytes = np.stack([(pb >> (8 * k)) & 0xFF for k in range(4)], axis=-1)
PB_BYTES = jnp.asarray(pb_bytes.reshape(37, -1), dtype=jnp.bfloat16)  # [37,512]
AOK_F = jnp.asarray(np.asarray(ANCHOR_OK), dtype=jnp.bfloat16)        # [37,64]


def native(ids):
    return PLACE_BITS[ids], ANCHOR_OK[ids]


def onehot(ids):
    oh = jax.nn.one_hot(ids.reshape(-1), NUM_PIECE_TYPES, dtype=jnp.bfloat16)
    by = jax.lax.dot_general(oh, PB_BYTES, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    by = by.astype(jnp.uint32).reshape(*ids.shape, 64, 2, 4)
    bits = (by[..., 0] | (by[..., 1] << 8) | (by[..., 2] << 16)
            | (by[..., 3] << 24))
    aok = jax.lax.dot_general(oh, AOK_F, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    aok = (aok > 0.5).reshape(*ids.shape, 64)
    return bits, aok


ids = jr.randint(jr.key(0), (N, 3), 0, 37)
fn_a = jax.jit(native)
fn_b = jax.jit(onehot)
ra = fn_a(ids); rb = fn_b(ids)
jax.block_until_ready((ra, rb))
assert (np.asarray(ra[0]) == np.asarray(rb[0])).all(), "bits mismatch"
assert (np.asarray(ra[1]) == np.asarray(rb[1])).all(), "aok mismatch"

for name, fn in (("native gather", fn_a), ("one-hot matmul", fn_b)):
    t0 = time.time()
    for _ in range(50):
        r = fn(ids)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 50
    print(f"{name:16s} N={N}: {dt*1e6:9.1f} us")

PB_FLAT = PLACE_BITS.reshape(37, 128)  # one row = one 128-lane tile

def flat_gather(ids):
    return PB_FLAT[ids].reshape(*ids.shape, 64, 2), ANCHOR_OK[ids]

fn_c = jax.jit(flat_gather)
rc = fn_c(ids)
jax.block_until_ready(rc)
assert (np.asarray(ra[0]) == np.asarray(rc[0])).all()

# gather fused with the AND + compare consumer (mimics valid3_bits)
bits = jr.randint(jr.key(1), (N, 2), 0, 1 << 30).astype(jnp.uint32)

def valid3_native(bits, ids):
    pbg = PLACE_BITS[ids]
    ov = bits[:, None, None, :] & pbg
    return ANCHOR_OK[ids] & ((ov[..., 0] | ov[..., 1]) == 0)

def valid3_flat(bits, ids):
    pbg = PB_FLAT[ids].reshape(*ids.shape, 64, 2)
    ov = bits[:, None, None, :] & pbg
    return ANCHOR_OK[ids] & ((ov[..., 0] | ov[..., 1]) == 0)

fn_d = jax.jit(valid3_native); fn_e = jax.jit(valid3_flat)
rd = fn_d(bits, ids); re_ = fn_e(bits, ids)
jax.block_until_ready((rd, re_))
assert (np.asarray(rd) == np.asarray(re_)).all()

for name, fn, args in (("flat-tile gather", fn_c, (ids,)),
                       ("valid3 native", fn_d, (bits, ids)),
                       ("valid3 flat", fn_e, (bits, ids))):
    t0 = time.time()
    for _ in range(50):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / 50
    print(f"{name:16s} N={N}: {dt*1e6:9.1f} us")
