"""Op-level TPU profile of the fused step (regen included)."""
import os, sys, time, glob
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, jax.random as jr
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import step, observe
from bbx.env.vector import sample_valid_actions_device

N = 4096
CHUNK = 32

@jax.jit
def run_chunk(state, key):
    def body(state, key_t):
        actions = sample_valid_actions_device(key_t, observe(state)["action_mask"])
        out = step(state, actions, auto_reset=True)
        return out.state, out.reward.sum()
    ks = jr.split(key, CHUNK)
    state, r = jax.lax.scan(body, state, ks)
    return state, r.sum()

state = jax.jit(reset)(make_env_keys(0, N))
t0 = time.time()
state, _ = run_chunk(state, jr.key(1))
jax.block_until_ready(state)
print(f"warm: {time.time()-t0:.1f}s", flush=True)

logdir = "/tmp/bbx_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    state, r = run_chunk(state, jr.key(2))
    jax.block_until_ready(state)

files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("trace files:", files, flush=True)

# Convert to op profile and print top ops by self time.
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
import json
for tool in ("op_profile", "overview_page"):
    try:
        data, _ = rtd.xspace_to_tool_data(files, tool, {})
        out = f"/tmp/bbx_trace/{tool}.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print("wrote", out, flush=True)
    except Exception as e:
        print(tool, "failed:", e, flush=True)
