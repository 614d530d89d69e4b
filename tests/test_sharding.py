"""Multi-device sharding: the full train step over an 8-device CPU mesh
(the path the driver dry-runs via __graft_entry__.dryrun_multichip)."""
import sys
import os

import jax
import numpy as np
import pytest

from rl_collision_avoidance_tpu.algo import PPOConfig
from rl_collision_avoidance_tpu.parallel import (arena_sharding, make_mesh,
                                                 DATA_AXIS)
from rl_collision_avoidance_tpu.train import TrainConfig, Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_train_step_on_8_device_mesh():
    mesh = make_mesh(8)
    cfg = TrainConfig(world="mini", n_arenas=8, horizon=2,
                      ppo=PPOConfig(batch_size=16, epochs=1))
    tr = Trainer(cfg, mesh=mesh)
    state = tr.init_state()
    # env state is actually spread over all 8 devices
    sharding = state.env_state.pose.sharding
    assert len(sharding.device_set) == 8
    state, metrics = tr._step_fn(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["policy_loss"])
    assert int(m["env_steps"]) == 2 * 8 * 4
    # params stay replicated
    assert state.params["params"]["logstd"].sharding.is_fully_replicated


def test_graft_entry_dryrun():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_single():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    v, mean, logstd = out
    assert v.shape == (24, 1) and mean.shape == (24, 2)
