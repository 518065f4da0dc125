"""Shared config for the multi-process tests (imported by the test and the
worker so both arms run the identical recipe).

Production-ish shape per the round-3 review: >= 256 envs and the real conv
stack, small enough in epochs/rollout to keep the three arms (multi-process
continuous, multi-process save/resume, single-process reference) within the
suite's time budget on 2 CPU cores.
"""

K_ITERS = 2

MP_CFG = {
    "training": {"num_envs": 256, "rollout_steps": 4, "batch_size": 1024,
                 "total_timesteps": 1 << 30},
    "ppo": {"num_epochs": 1},
    # Structurally the production network (conv stack + BN + residual +
    # fc trunk + masked heads) at reduced width: the full (64,128,128)/
    # (512,256) program compiles for many minutes per process on a 2-core
    # CI host, starving the 30s Gloo rendezvous windows.  Parallelism
    # correctness depends on the graph structure, not the channel count.
    "network": {"conv_channels": [16, 32], "fc_hidden": [64],
                "use_batch_norm": True, "use_residual": True,
                "compute_dtype": "float32"},
}
