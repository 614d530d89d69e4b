"""Worker process for test_distributed.py: one rank of a 2-process
``jax.distributed`` run (4 virtual CPU devices each -> 8 global devices).

Runs ONE train step of the same config as the single-process reference in
the test and has rank 0 dump the (replicated) updated params so the parent
can compare them against the single-process 8-device result.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

# The axon TPU plugin's site hook forces jax_platforms back to "axon" at
# interpreter start; undo it before the backend initializes (see conftest.py).
jax.config.update("jax_platforms", "cpu")


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = int(sys.argv[3])
    out_dir = sys.argv[4]

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=rank,
    )
    assert len(jax.devices()) == 8, jax.devices()

    from rl_collision_avoidance_tpu.algo import PPOConfig
    from rl_collision_avoidance_tpu.parallel import make_mesh
    from rl_collision_avoidance_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(world="mini", n_arenas=8, horizon=4,
                      ppo=PPOConfig(batch_size=16, epochs=1), seed=3)
    tr = Trainer(cfg, mesh=make_mesh(8))
    state = tr.init_state()
    state, _ = tr._step_fn(state)

    # Params are replicated; every process holds full addressable copies.
    flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
    named = {
        jax.tree_util.keystr(k): np.asarray(jax.device_get(v))
        for k, v in flat
    }
    if rank == 0:
        np.savez(f"{out_dir}/params_mp.npz", **named)
    # Everyone must reach shutdown together (collectives are SPMD).
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
