"""End-to-end train step + checkpoint round trip (mini world, tiny shapes)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from rl_collision_avoidance_tpu.algo import PPOConfig
from rl_collision_avoidance_tpu.parallel import make_mesh
from rl_collision_avoidance_tpu.train import TrainConfig, Trainer
from rl_collision_avoidance_tpu.utils.checkpoint import CheckpointManager


def _trainer(n_arenas=2, horizon=4, mesh_n=1):
    cfg = TrainConfig(world="mini", n_arenas=n_arenas, horizon=horizon,
                      ppo=PPOConfig(batch_size=8, epochs=1,
                                    learning_rate=5e-5))
    return Trainer(cfg, mesh=make_mesh(mesh_n))


def test_train_step_runs_and_learns_shape():
    tr = _trainer()
    state = tr.init_state()
    p0 = jax.device_get(state.params)
    state, metrics = tr._step_fn(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["policy_loss"]) and np.isfinite(m["value_loss"])
    assert int(m["env_steps"]) == 4 * 2 * 4  # horizon * arenas * robots
    assert int(jax.device_get(state.update)) == 1
    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()),
                                   p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_train_determinism():
    tr = _trainer()
    outs = []
    for _ in range(2):
        state = tr.init_state()
        state, _ = tr._step_fn(state)
        outs.append(jax.device_get(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_roundtrip(tmp_path):
    tr = _trainer()
    state = tr.init_state()
    state, _ = tr._step_fn(state)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    assert mgr.latest_step() == 1
    restored = mgr.restore(1, jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training
    s2, m2 = tr._step_fn(tr.shard_state(restored))
    assert np.isfinite(float(jax.device_get(m2)["policy_loss"]))
    assert int(jax.device_get(s2.update)) == 2


def test_trainer_host_loop(tmp_path):
    tr = _trainer()
    logs = []
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = tr.train(updates=2, log_fn=logs.append, checkpoint_manager=mgr,
                     checkpoint_every=2)
    assert len(logs) == 2
    assert logs[-1]["update"] == 2
    assert mgr.latest_step() == 2


def test_save_best_checkpoint(tmp_path):
    tr = _trainer()
    state = tr.init_state()
    mgr = CheckpointManager(str(tmp_path / "b"))
    assert mgr.save_best(1, state, 0.5)
    assert not mgr.save_best(2, state, 0.4)   # worse: not saved
    assert mgr.save_best(3, state, 0.9)
    best = mgr.restore_best(jax.device_get(state))
    assert best is not None


def test_stage_presets_scale_batch():
    from rl_collision_avoidance_tpu.train import TrainConfig
    c1 = TrainConfig.stage1(n_arenas=4)
    assert c1.ppo.batch_size == 4096 and c1.ppo.epochs == 2
    c2 = TrainConfig.stage2(n_arenas=2)
    assert c2.world == "stage2"
    assert c2.ppo.batch_size == 1024 and c2.ppo.epochs == 4


def test_bf16_obs_storage_runs():
    import jax.numpy as jnp
    from rl_collision_avoidance_tpu.algo import PPOConfig
    from rl_collision_avoidance_tpu.parallel import make_mesh
    from rl_collision_avoidance_tpu.train import TrainConfig, Trainer
    cfg = TrainConfig(world="mini", n_arenas=2, horizon=4,
                      ppo=PPOConfig(batch_size=8, epochs=1),
                      obs_store_dtype=jnp.bfloat16)
    tr = Trainer(cfg, mesh=make_mesh(1))
    state, metrics = tr._step_fn(tr.init_state())
    assert np.isfinite(float(jax.device_get(metrics)["policy_loss"]))
