"""Equivalence tests for the fused Pallas trunk kernels (ops/trunk_pallas).

The kernels replace the XLA conv path in the PPO update (the measured
training bottleneck, docs/PERF.md); these tests pin them numerically to
the flax reference apply — forward AND backward (custom_vjp) — in exact
f32 mode, and sanity-bound the default (bf16-multiply) MXU precision.
Runs in interpreter mode on the CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from rl_collision_avoidance_tpu.models import CNNPolicy
from rl_collision_avoidance_tpu.ops.trunk_pallas import (cnn_pallas_apply,
                                                         fused_trunks,
                                                         stack_trunk_params,
                                                         TrunkConfig)


@pytest.fixture(scope="module")
def setup():
    model = CNNPolicy()
    b = 40  # deliberately not a tile multiple: exercises the zero-padding
    scans = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 512))
    goal = jax.random.normal(jax.random.PRNGKey(2), (b, 2))
    speed = jax.random.normal(jax.random.PRNGKey(3), (b, 2))
    params = model.init(jax.random.PRNGKey(0), scans[:1], goal[:1], speed[:1])
    return model, params, scans, goal, speed


F32 = dict(tile_fwd=16, tile_bwd=16, precision="float32")


def test_forward_matches_flax(setup):
    model, params, scans, goal, speed = setup
    ref = model.apply(params, scans, goal, speed)
    out = cnn_pallas_apply(params, scans, goal, speed, **F32)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o), atol=3e-6)


def test_backward_matches_flax(setup):
    model, params, scans, goal, speed = setup

    def loss(fn, p):
        v, m, ls = fn(p, scans, goal, speed)
        # touches every head (and through them both trunks) + logstd
        return jnp.sum(v ** 2) + jnp.sum(m ** 2) + jnp.sum(ls ** 2)

    g_ref = jax.grad(partial(loss, model.apply))(params)
    g_pal = jax.grad(partial(loss, partial(cnn_pallas_apply, **F32)))(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_pal)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5 * scale,
                                   err_msg=jax.tree_util.keystr(ka))


def test_scan_cotangent_is_zero(setup):
    """The kernel's documented contract: obs is data, dX is a zeros
    placeholder (DCE'd whenever unused)."""
    model, params, scans, goal, speed = setup
    g = jax.grad(lambda s: jnp.sum(
        cnn_pallas_apply(params, s, goal, speed, **F32)[0]))(scans)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_default_precision_close(setup):
    """bf16-multiply/f32-accumulate (the TPU default the XLA conv path also
    uses) stays within bf16 rounding of the exact f32 apply."""
    model, params, scans, goal, speed = setup
    ref = model.apply(params, scans, goal, speed)
    out = cnn_pallas_apply(params, scans, goal, speed,
                           tile_fwd=16, tile_bwd=16, precision="default")
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(out[0]),
                               atol=5e-2)  # value head, |v| ~ 1
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(out[1]),
                               atol=2e-2)  # mean in (0,1)/(-1,1)


def test_trainer_pallas_update_matches_conv():
    """One full sharded train step with apply_impl='pallas' stays close to
    the conv-apply step (same rollout; update differs only by MXU-default
    rounding inside the kernels)."""
    from rl_collision_avoidance_tpu.algo.ppo import PPOConfig
    from rl_collision_avoidance_tpu.train import TrainConfig, Trainer

    def run(impl):
        cfg = TrainConfig(world="mini", n_arenas=8, horizon=16,
                          ppo=PPOConfig(batch_size=128, epochs=2),
                          apply_impl=impl)
        tr = Trainer(cfg)
        state, metrics = tr._step_fn(tr.init_state())
        return jax.device_get(state.params), jax.device_get(metrics)

    p_conv, m_conv = run("conv")
    p_pal, m_pal = run("pallas")
    # identical rollout (same seed, conv rollout forward in both)
    assert m_conv["env_steps"] == m_pal["env_steps"]
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_conv)[0],
            jax.tree_util.tree_flatten_with_path(p_pal)[0]):
        scale = float(np.max(np.abs(a))) + 1e-8
        np.testing.assert_allclose(a, b, atol=1e-2 * scale,
                                   err_msg=jax.tree_util.keystr(ka))


def test_fused_trunks_bf16_input(setup):
    """bf16 scans (the --obs-bf16 storage mode) are accepted and match the
    same-cast flax forward."""
    model, params, scans, goal, speed = setup
    cfg = TrunkConfig(tile_fwd=16, tile_bwd=16, precision="float32",
                      out_dtype="float32", interpret=True)
    stacked = stack_trunk_params(params["params"])
    out = fused_trunks(stacked, scans.astype(jnp.bfloat16), cfg)
    ref = fused_trunks(stacked, scans.astype(jnp.bfloat16)
                       .astype(jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
