"""Stats on drain workload: per-lane candidate counts and screen outcomes
for draws that fail the disjoint fast path, under random valid play (CPU)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, jax.random as jr
from bbx.engine.state import make_env_keys, reset, _draw
from bbx.engine.step import step, observe
from bbx.engine import kernel as K
from bbx.engine import solvability as SV
from bbx.env.vector import sample_valid_actions_device

N, STEPS = 512, 96
keys = make_env_keys(0, N)
state = jax.jit(reset)(keys)
step_j = jax.jit(lambda s, a: step(s, a, auto_reset=True))
obs_j = jax.jit(observe)
va = jax.jit(K.valid_anchors_all_pieces)
gv = jax.jit(K.gather_piece_validity)

alpha_counts, beta_counts = [], []
n_pend = n_acc1 = n_rej = n_exact = n_exact_acc = 0
ex_alpha, ex_beta = [], []
key = jr.key(7)

for t in range(STEPS):
    o = obs_j(state)
    acts = sample_valid_actions_device(jr.key(1000 + t), o["action_mask"])
    out = step_j(state, acts)
    # Simulate a fresh draw on every lane's *current* board (proxy for the
    # regen draw distribution) and look at disjoint failures.
    key, k = jr.split(key)
    ids = _draw(jax.vmap(lambda q: jr.split(q, 1)[0])(jr.split(k, N)))
    board = out.state.board
    avl = va(board)
    v3 = gv(avl, ids)
    fast = np.asarray(SV.solvable_disjoint(v3, ids))
    pend = np.nonzero(~fast)[0]
    if len(pend) == 0:
        state = out.state
        continue
    b, i3, v = board[pend], ids[pend], v3[pend]
    cand = SV.clear_candidates(b, i3, v)
    acc = np.asarray(SV.solvable_clear1(b, i3, cand))
    rej = np.asarray(SV.unsolvable_certain(b, i3, v, cand)) & ~acc
    unknown = ~acc & ~rej
    n_pend += len(pend); n_acc1 += acc.sum(); n_rej += rej.sum()
    # candidate-count stats for the unknown (exact-needed) lanes
    rowsum = jnp.sum(b.astype(jnp.int32), axis=2)
    colsum = jnp.sum(b.astype(jnp.int32), axis=1)
    rc = SV.ROW_COUNT[i3]; cc = SV.COL_COUNT[i3]
    cand1 = np.asarray(cand).reshape(len(pend), -1).sum(1)
    # beta blocks: ordered pairs with union clears (a1 blocks with any a2)
    cb = []
    for a_, b_ in SV._PAIRS:
        pa, pb = i3[:, a_], i3[:, b_]
        row_u = jnp.any(rowsum[:, None, None, :] + rc[:, a_][:, :, None, :]
                        + rc[:, b_][:, None, :, :] == 8, axis=-1)
        col_u = jnp.any(colsum[:, None, None, :] + cc[:, a_][:, :, None, :]
                        + cc[:, b_][:, None, :, :] == 8, axis=-1)
        okp = ((v[:, a_] & ~jnp.any(cand[:, a_], axis=-1, keepdims=True))[:, :, None]
               & v[:, b_][:, None, :] & ~SV.PAIR_CONFLICT[pa, pb] & (row_u | col_u))
        cb.append(np.asarray(jnp.any(okp, axis=2)).reshape(len(pend), -1).sum(1))
    beta_blk = np.stack(cb, 1).sum(1)
    uix = np.nonzero(unknown)[0]
    if len(uix):
        exact = np.asarray(SV.solvable_exact(b[uix], i3[uix], v[uix],
                                             jnp.ones(len(uix), bool)))
        n_exact += len(uix); n_exact_acc += exact.sum()
        ex_alpha.extend(cand1[uix].tolist()); ex_beta.extend(beta_blk[uix].tolist())
    alpha_counts.extend(cand1.tolist()); beta_counts.extend(beta_blk.tolist())
    state = out.state

pctl = lambda a: np.percentile(np.array(a), [50, 90, 99, 100]).round(1).tolist() if a else []
print(f"pend={n_pend} ({n_pend/(N*STEPS):.3f}/lane-step)  clear1-acc={n_acc1} "
      f"({n_acc1/max(n_pend,1):.2f})  certain-rej={n_rej} ({n_rej/max(n_pend,1):.2f})  "
      f"exact={n_exact} ({n_exact/max(n_pend,1):.2f}, acc-rate {n_exact_acc/max(n_exact,1):.2f})")
print(f"alpha cands  all-pend p50/90/99/max: {pctl(alpha_counts)}")
print(f"beta  blocks all-pend p50/90/99/max: {pctl(beta_counts)}")
print(f"alpha cands  exact-needed:           {pctl(ex_alpha)}")
print(f"beta  blocks exact-needed:           {pctl(ex_beta)}")
