"""Coverage of cheap accept/reject screens on real regen draw distribution.

For disjoint-failed draws measure:
  S1 accept: exists valid clearing placement of one piece such that the other
             two have disjoint valid placements on the cleared board.
  R  reject: no single valid clearing placement AND no disjoint valid pair
             whose union completes a line  (=> provably unsolvable given
             disjoint-triple already failed).
Residual (needs exact search) = ~disjoint & ~S1 & ~R.
"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, jax.random as jr
from bbx.engine import pieces as P
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import step, observe
from bbx.engine import kernel as K
from bbx.engine.solvability import solvable_disjoint, solvable_full
from bbx.env.vector import sample_valid_actions_device

PL = np.asarray(P.PLACEMENT)      # [37,64,64] bool
AOK = np.asarray(P.ANCHOR_OK)     # [37,64]

def valid_np(flat, p):
    """flat [64] bool; p int -> [64] bool valid anchors."""
    return AOK[p] & ~(PL[p] @ flat.astype(np.int64) > 0)

def clear_np(flat):
    g = flat.reshape(8, 8).copy()
    rf = g.all(axis=1); cf = g.all(axis=0)
    g[rf, :] = False; g[:, cf] = False
    return g.reshape(64)

def causes_clear_np(flat, p, a):
    g = (flat | PL[p, a]).reshape(8, 8)
    return g.all(axis=1).any() or g.all(axis=0).any()

def disjoint_pair_np(flat, q, r):
    vq = valid_np(flat, q); vr = valid_np(flat, r)
    for a in np.nonzero(vq)[0]:
        if (vr & ~(PL[r] @ PL[q, a].astype(np.int64) > 0)).any():
            return True
    return False

def s1_np(flat, ids):
    for i in range(3):
        p = ids[i]; rest = [ids[j] for j in range(3) if j != i]
        v = valid_np(flat, p)
        for a in np.nonzero(v)[0]:
            if causes_clear_np(flat, p, a):
                b1 = clear_np(flat | PL[p, a])
                if disjoint_pair_np(b1, rest[0], rest[1]):
                    return True
    return False

def r_np(flat, ids):
    # any single valid clearing placement?
    for i in range(3):
        v = valid_np(flat, ids[i])
        for a in np.nonzero(v)[0]:
            if causes_clear_np(flat, ids[i], a):
                return False
    # any disjoint valid pair whose union clears?
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            q, r = ids[i], ids[j]
            vq, vr = valid_np(flat, q), valid_np(flat, r)
            for a in np.nonzero(vq)[0]:
                ok_b = vr & ~(PL[r] @ PL[q, a].astype(np.int64) > 0)
                for b in np.nonzero(ok_b)[0]:
                    g = (flat | PL[q, a] | PL[r, b]).reshape(8, 8)
                    if g.all(axis=1).any() or g.all(axis=0).any():
                        return False
    return True  # certain reject

N = 256
STEPS = 50
keys = make_env_keys(0, N)
state = jax.jit(reset)(keys)
step_j = jax.jit(lambda s, a: step(s, a, auto_reset=True))
obs_j = jax.jit(observe)
va = jax.jit(K.valid_anchors_all_pieces)
disj = jax.jit(lambda av, ids: solvable_disjoint(K.gather_piece_validity(av, ids), ids))
full_j = jax.jit(lambda b, ids: solvable_full(b, ids, a1_block=8))
rng_np = np.random.default_rng(0)

cnt = dict(draws=0, dfail=0, s1=0, r=0, resid=0, resid_solv=0,
           s1_and_unsolv=0, r_and_solv=0)

for t in range(STEPS):
    o = obs_j(state)
    acts = sample_valid_actions_device(jr.key(1000 + t), o["action_mask"])
    slot, _ = K.decode_action(acts)
    out = step_j(state, acts)
    ns = out.state
    regen = np.asarray(
        jnp.all(state.used | jax.nn.one_hot(slot, 3, dtype=bool), axis=1)
        & ~state.done & (out.reward > -9))
    idx = np.nonzero(regen)[0]
    if len(idx):
        boards = np.asarray(ns.board)[idx].reshape(len(idx), 64) > 0
        b = jnp.asarray(np.asarray(ns.board)[idx])
        avi = va(b)
        L = len(idx)
        pending = np.ones(L, bool)
        rounds = 0
        while pending.any() and rounds < 100:
            rounds += 1
            ids = rng_np.integers(0, 37, (L, 3))
            jids = jnp.asarray(ids, jnp.int32)
            cnt["draws"] += int(pending.sum())
            ok_fast = np.asarray(disj(avi, jids))
            fail = pending & ~ok_fast
            cnt["dfail"] += int(fail.sum())
            ok_full = np.asarray(full_j(b, jids)) if fail.any() else np.zeros(L, bool)
            for li in np.nonzero(fail)[0]:
                s1 = s1_np(boards[li], ids[li])
                rj = r_np(boards[li], ids[li])
                solv = bool(ok_full[li])
                if s1:
                    cnt["s1"] += 1
                    if not solv:
                        cnt["s1_and_unsolv"] += 1
                elif rj:
                    cnt["r"] += 1
                    if solv:
                        cnt["r_and_solv"] += 1
                else:
                    cnt["resid"] += 1
                    cnt["resid_solv"] += int(solv)
            pending = pending & ~(ok_fast | ok_full)
    state = ns

print(f"draws={cnt['draws']}  disjoint-fail={cnt['dfail']} ({cnt['dfail']/cnt['draws']:.1%})")
d = max(1, cnt["dfail"])
print(f"of disjoint-fails: S1-accept {cnt['s1']/d:.1%}  R-reject {cnt['r']/d:.1%}  residual {cnt['resid']/d:.1%}")
print(f"residual solvable frac: {cnt['resid_solv']}/{cnt['resid']}")
print(f"SCREEN BUGS (must be 0): s1&unsolv={cnt['s1_and_unsolv']}  r&solv={cnt['r_and_solv']}")
