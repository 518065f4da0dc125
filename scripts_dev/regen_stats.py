"""Empirical regen workload statistics under random valid play (CPU)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, jax.random as jr
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import step, observe
from bbx.engine import kernel as K
from bbx.engine.solvability import solvable_disjoint, solvable_full
from bbx.env.vector import sample_valid_actions_device

N = 256
STEPS = 60

keys = make_env_keys(0, N)
state = jax.jit(reset)(keys)
step_j = jax.jit(lambda s, a: step(s, a, auto_reset=True))
obs_j = jax.jit(observe)
va = jax.jit(K.valid_anchors_all_pieces)
disj = jax.jit(lambda av, ids: solvable_disjoint(K.gather_piece_validity(av, ids), ids))
full_j = jax.jit(lambda b, ids: solvable_full(b, ids, a1_block=8))

rng_np = np.random.default_rng(0)

tot = dict(steps=0, regen_lanes=0, draws=0, disj_fail=0, full_acc=0, exhaust=0)
rounds_per_step = []
fills = []
draws_per_lane = []

for t in range(STEPS):
    o = obs_j(state)
    acts = sample_valid_actions_device(jr.key(1000 + t), o["action_mask"])
    slot, _ = K.decode_action(acts)
    out = step_j(state, acts)
    ns = out.state
    regen = np.asarray(
        jnp.all(state.used | jax.nn.one_hot(slot, 3, dtype=bool), axis=1)
        & ~state.done & (out.reward > -9)
    )
    idx = np.nonzero(regen)[0]
    tot["steps"] += 1
    tot["regen_lanes"] += len(idx)
    if len(idx):
        b = jnp.asarray(np.asarray(ns.board)[idx])
        avi = va(b)
        fills.extend((np.asarray(b).sum(axis=(1, 2)) / 64.0).tolist())
        L = len(idx)
        pending = np.ones(L, bool)
        lane_draws = np.zeros(L, np.int32)
        rounds = 0
        while pending.any() and rounds < 100:
            rounds += 1
            ids = jnp.asarray(rng_np.integers(0, 37, (L, 3)), jnp.int32)
            tot["draws"] += int(pending.sum())
            lane_draws += pending
            ok_fast = np.asarray(disj(avi, ids))
            fail = pending & ~ok_fast
            tot["disj_fail"] += int(fail.sum())
            if fail.any():
                ok_full = np.asarray(full_j(b, ids))
                tot["full_acc"] += int((fail & ok_full).sum())
                pending = pending & ~(ok_fast | ok_full)
            else:
                pending = pending & ~ok_fast
        tot["exhaust"] += int(pending.sum())
        rounds_per_step.append(rounds)
        draws_per_lane.extend(lane_draws.tolist())
    state = ns

fills = np.array(fills)
r = np.array(rounds_per_step)
d = np.array(draws_per_lane)
print(f"steps={tot['steps']} N={N}")
print(f"regen lanes/step:        {tot['regen_lanes']/tot['steps']:.1f}")
print(f"draws per regen lane:    mean {d.mean():.2f}  p90 {np.percentile(d,90):.0f}  p99 {np.percentile(d,99):.0f}  max {d.max()}")
print(f"disjoint-fail frac of draws: {tot['disj_fail']/max(1,tot['draws']):.3f}")
print(f"full-accept / disj-fail: {tot['full_acc']}/{tot['disj_fail']}")
print(f"exhaustions:             {tot['exhaust']} ({tot['exhaust']/max(1,tot['regen_lanes'])*100:.2f}% of regens)")
print(f"while-rounds/step:       mean {r.mean():.1f}  p50 {np.percentile(r,50):.0f}  p90 {np.percentile(r,90):.0f}  max {r.max()}")
print(f"board fill at regen:     mean {fills.mean():.2f}  p90 {np.percentile(fills,90):.2f}  max {fills.max():.2f}")
