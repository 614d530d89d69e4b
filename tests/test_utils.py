"""utils coverage: RunningMeanStd parity vs a black-box numpy oracle
(reference ``model/utils.py:101-128``), StepTimer, and the Trainer's
--profile wiring (utils/profiling.py)."""
import numpy as np
import jax.numpy as jnp

from rl_collision_avoidance_tpu.utils.running_stats import RunningMeanStd
from rl_collision_avoidance_tpu.utils.profiling import StepTimer, trace


def test_running_mean_std_matches_full_batch():
    """Sequential Chan-merge updates == moments of the concatenated data
    (the reference's update(x) semantics, model/utils.py:108-128)."""
    rng = np.random.default_rng(0)
    chunks = [rng.normal(3.0, 2.0, size=(n, 4)).astype(np.float64)
              for n in (5, 17, 1, 64)]
    rms = RunningMeanStd.create(shape=(4,))
    for c in chunks:
        rms = rms.update(jnp.asarray(c))
    full = np.concatenate(chunks)
    # epsilon=1e-4 initial count biases by ~1e-6 at n=87 — inside tolerance
    np.testing.assert_allclose(np.asarray(rms.mean), full.mean(0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(rms.std), full.std(0), atol=1e-3)
    assert abs(float(rms.count) - len(full)) < 1e-3


def test_step_timer_ema():
    t = StepTimer(alpha=0.5)
    t.start()
    r1 = t.stop(100)
    assert r1 > 0 and t.ema == r1
    t.start()
    r2 = t.stop(100)
    assert abs(t.ema - (0.5 * r2 + 0.5 * r1)) < 1e-9


def test_trainer_profile_dir(tmp_path):
    """trainer.train(profile_dir=...) captures a trace directory."""
    from rl_collision_avoidance_tpu.algo.ppo import PPOConfig
    from rl_collision_avoidance_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(world="mini", n_arenas=8, horizon=8,
                      ppo=PPOConfig(batch_size=64, epochs=1))
    tr = Trainer(cfg)
    out = tmp_path / "trace"
    tr.train(updates=3, profile_dir=str(out), profile_updates=2)
    assert out.exists() and any(out.rglob("*"))
