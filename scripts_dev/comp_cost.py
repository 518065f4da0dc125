"""Fused per-component costs on TPU: screens, full search, compaction."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine import solvability as S
from bbx.engine import kernel as K

REPS = 16

def fused_bench(name, make_fn, *args):
    """make_fn(*args) -> fn(i) whose output depends on i; scan REPS times."""
    fn = make_fn(*args)
    @jax.jit
    def many():
        def body(c, i):
            out = fn(i)
            return c, jax.tree.map(lambda x: x.sum(), out)
        _, outs = jax.lax.scan(body, 0, jnp.arange(REPS))
        return outs
    out = many(); jax.block_until_ready(out)
    t0 = time.time()
    out = many(); jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    print(f"{name:44s} {dt*1e3:8.3f} ms")

key = jr.key(0)

def mk_boards(n, seed=0):
    b = (jr.uniform(jr.key(seed), (n, 8, 8)) < 0.45).astype(jnp.uint8)
    ids = jr.randint(jr.key(seed + 1), (n, 3), 0, 37)
    return b, ids

for n in (128, 512, 1024):
    b, ids = mk_boards(n)
    def mk_full(b=b, ids=ids, n=n):
        def fn(i):
            return S.solvable_full(b ^ (i % 2).astype(jnp.uint8), ids, a1_block=64)
        return fn
    fused_bench(f"solvable_full n={n}", mk_full)

for n in (512, 1024):
    b, ids = mk_boards(n)
    av = K.valid_anchors_all_pieces(b)
    v3 = K.gather_piece_validity(av, ids)
    need = jnp.ones(n, bool)
    def mk_scr(b=b, ids=ids, v3=v3, need=need):
        def fn(i):
            return S.solvable_screened(b ^ (i % 2).astype(jnp.uint8), ids, v3, need)
        return fn
    fused_bench(f"solvable_screened n={n} (incl full resid)", mk_scr)
    def mk_scr2(b=b, ids=ids, v3=v3):
        cand = S.clear_candidates(b, ids, v3)
        def fn(i):
            bb = b ^ (i % 2).astype(jnp.uint8)
            c = S.clear_candidates(bb, ids, v3)
            s1 = S.solvable_clear1(bb, ids, c)
            rej = S.unsolvable_certain(bb, ids, v3, c)
            return s1 ^ rej
        return fn
    fused_bench(f"screens only (cand+s1+rej) n={n}", mk_scr2)

for n in (4096, 16384):
    b, ids = mk_boards(n)
    av = K.valid_anchors_all_pieces(b)
    v3 = K.gather_piece_validity(av, ids)
    def mk_d(v3=v3, ids=ids):
        def fn(i):
            return S.solvable_disjoint(v3 ^ (i % 2 == 99), ids)
        return fn
    fused_bench(f"solvable_disjoint n={n}", mk_d)

    mask = jr.uniform(jr.key(5), (n,)) < 0.12
    def mk_topk(mask=mask, n=n):
        def fn(i):
            return jax.lax.top_k((mask ^ (i % 2 == 99)).astype(jnp.float32), 512)[1]
        return fn
    fused_bench(f"top_k({n} -> 512)", mk_topk)

    def mk_cum(mask=mask, n=n):
        def fn(i):
            m = mask ^ (i % 2 == 99)
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            tgt = jnp.where(m & (pos < 512), pos, 512)
            idx = jnp.full((513,), n, jnp.int32)
            idx = idx.at[tgt].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
            return idx[:512]
        return fn
    fused_bench(f"cumsum-compact({n} -> 512)", mk_cum)

    def mk_gather(mask=mask, b=b, av=av, n=n):
        def fn(i):
            m = mask ^ (i % 2 == 99)
            idx = jax.lax.top_k(m.astype(jnp.float32), 512)[1]
            return b[idx].sum() + av[idx].sum()
        return fn
    fused_bench(f"top_k+gather board/av ({n})", mk_gather)

# full valid_anchors at large batch
for n in (4096, 16384):
    b, _ = mk_boards(n)
    def mk_va(b=b):
        def fn(i):
            return K.valid_anchors_all_pieces(b ^ (i % 2).astype(jnp.uint8))
        return fn
    fused_bench(f"valid_anchors_all n={n}", mk_va)
