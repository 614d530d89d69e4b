"""Golden-value tests for GAE and the PPO update — the unit coverage the
reference lacks entirely (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_collision_avoidance_tpu.algo import (Batch, PPOConfig,
                                             calculate_returns,
                                             generate_train_data,
                                             normalize_advantages, ppo_loss,
                                             ppo_update)


def _gae_numpy(rewards, gamma, values, last_value, dones, lam):
    """Literal transcription of the generate_train_data formula
    (model/ppo.py:122-139) as an independent oracle."""
    t, e = rewards.shape
    vals = np.concatenate([values, last_value[None]], axis=0)
    targets = np.zeros((t, e))
    gae = np.zeros(e)
    for i in range(t - 1, -1, -1):
        delta = rewards[i] + gamma * vals[i + 1] * (1 - dones[i]) - vals[i]
        gae = delta + gamma * lam * (1 - dones[i]) * gae
        targets[i] = gae + vals[i]
    return targets, targets - vals[:-1]


def test_gae_matches_reference_formula():
    rng = np.random.default_rng(0)
    t, e = 16, 5
    rewards = rng.standard_normal((t, e))
    values = rng.standard_normal((t, e))
    last_value = rng.standard_normal(e)
    dones = (rng.random((t, e)) < 0.15).astype(np.float64)
    want_t, want_a = _gae_numpy(rewards, 0.99, values, last_value, dones, 0.95)
    got_t, got_a = generate_train_data(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(last_value),
        jnp.asarray(dones), 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=1e-5, atol=1e-6)


def test_gae_episode_cut():
    # After a done, later rewards must not leak into earlier targets.
    t, e = 4, 1
    rewards = np.asarray([[0.0], [0.0], [100.0], [0.0]])
    values = np.zeros((t, e))
    dones = np.asarray([[0.0], [1.0], [0.0], [0.0]])
    targets, advs = generate_train_data(
        jnp.asarray(rewards), jnp.asarray(values), jnp.zeros(1),
        jnp.asarray(dones), 0.99, 0.95)
    # step 1 is terminal with reward 0 -> its target sees nothing of the 100
    assert float(targets[1, 0]) == 0.0
    assert float(targets[0, 0]) == 0.0
    assert float(targets[2, 0]) > 99.0


def test_calculate_returns():
    rewards = np.asarray([[1.0], [1.0], [1.0]])
    dones = np.zeros((3, 1))
    ret = calculate_returns(jnp.asarray(rewards), jnp.asarray(dones),
                            jnp.zeros(1), gamma=0.5)
    np.testing.assert_allclose(np.asarray(ret)[:, 0], [1.75, 1.5, 1.0])


def _toy_batch(m=32, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        scans=jnp.asarray(rng.standard_normal((m, 3, 64)), jnp.float32) * 0.1,
        goal=jnp.asarray(rng.standard_normal((m, 2)), jnp.float32),
        speed=jnp.asarray(rng.standard_normal((m, 2)), jnp.float32),
        action=jnp.asarray(rng.standard_normal((m, 2)), jnp.float32),
        logprob=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        target=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        adv=jnp.asarray(rng.standard_normal((m, 1)), jnp.float32),
        weight=jnp.ones((m,), jnp.float32),
    )


def _apply_fn():
    from rl_collision_avoidance_tpu.models import CNNPolicy
    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    return model.apply, params


def test_masked_loss_equals_filtered_loss():
    """The weight-mask replacement for np.delete (model/ppo.py:212-218) must
    give the same loss as physically removing the masked rows."""
    apply_fn, params = _apply_fn()
    cfg = PPOConfig()
    full = _toy_batch(32)
    w = np.ones(32, np.float32)
    w[10:20] = 0.0
    masked = full._replace(weight=jnp.asarray(w))
    keep = np.concatenate([np.arange(10), np.arange(20, 32)])
    filtered = jax.tree_util.tree_map(lambda x: x[keep], full)
    l_masked, aux_m = ppo_loss(apply_fn, params, masked, cfg)
    l_filt, aux_f = ppo_loss(apply_fn, params, filtered, cfg)
    np.testing.assert_allclose(float(l_masked), float(l_filt), rtol=1e-5)
    np.testing.assert_allclose(float(aux_m[0]), float(aux_f[0]), rtol=1e-5)
    np.testing.assert_allclose(float(aux_m[1]), float(aux_f[1]), rtol=1e-5)


def test_ppo_loss_clipping():
    """With adv > 0 and ratio >> 1+clip, the clipped surrogate caps the
    objective; with ratio inside the trust region the raw surrogate rules."""
    apply_fn, params = _apply_fn()
    cfg = PPOConfig(clip_value=0.1)
    b = _toy_batch(8)
    # behavior logprob very low -> ratio huge
    b_hi = b._replace(logprob=jnp.full((8, 1), -50.0),
                      adv=jnp.ones((8, 1)))
    _, (pl_hi, _, _) = ppo_loss(apply_fn, params, b_hi, cfg)
    np.testing.assert_allclose(float(pl_hi), -1.1, rtol=1e-5)


def test_ppo_update_improves_loss_and_changes_params():
    apply_fn, params = _apply_fn()
    cfg = PPOConfig(batch_size=16, epochs=4, learning_rate=1e-3)
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    batch = _toy_batch(64)
    new_params, new_opt, metrics = jax.jit(
        lambda p, o, b, k: ppo_update(apply_fn, p, o, tx, b, k, cfg)
    )(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["policy_loss"]))
    assert np.isfinite(float(metrics["value_loss"]))
    # params moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # value loss should drop when re-evaluated on the same data
    _, (_, vl_before, _) = ppo_loss(apply_fn, params, batch, cfg)
    _, (_, vl_after, _) = ppo_loss(apply_fn, new_params, batch, cfg)
    assert float(vl_after) < float(vl_before)


def test_normalize_advantages():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((100, 1)) * 5 + 3)
    y = np.asarray(normalize_advantages(x))
    np.testing.assert_allclose(y.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(y.std(), 1.0, atol=1e-5)


def test_valid_mask_matches_reference_filter():
    """Our per-step ``valid = alive-at-step-start`` mask must equal the
    complement of the reference's get_filter_index (model/utils.py:65-78):
    delete a transition when its done flag has been True for >= 2 consecutive
    steps."""
    rng = np.random.default_rng(1)
    t, e = 20, 6
    # Per robot: dies at step k, group-resets at the end of step m >= k.
    # The reference rank reports terminal=True at steps k..m (latched), fresh
    # False from m+1; it is dead at the START of steps k+1..m.
    done_list = np.zeros((t, e), bool)
    dead_at_start = np.zeros((t, e), bool)
    for i in range(e):
        k = int(rng.integers(0, t - 2))
        m = int(rng.integers(k, t - 1))
        done_list[k:m + 1, i] = True
        dead_at_start[k + 1:m + 1, i] = True
    # reference filter (model/utils.py:65-78)
    filter_idx = []
    for i in range(e):
        flag = 0
        for j in range(t):
            flag = flag + 1 if done_list[j, i] else 0
            if flag >= 2:
                filter_idx.append(e * j + i)
    # our mask: valid iff robot was alive at the START of the step
    deleted = np.nonzero(dead_at_start.reshape(-1))[0]
    # flat index num_env*j + i == row-major over (t, e)
    np.testing.assert_array_equal(sorted(filter_idx), deleted)


def test_ppo_update_warns_on_dropped_remainder():
    """A rollout not divisible by batch_size silently lost samples in round 1
    (VERDICT weak #7); now it must warn at trace time, and preset-exact
    shapes must stay silent."""
    import warnings

    import optax

    apply_fn, params = _apply_fn()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    batch = _toy_batch(60)  # 60 % 16 != 0 -> 12 dropped per epoch
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ppo_update(apply_fn, params, opt_state, tx, batch,
                   jax.random.PRNGKey(0), PPOConfig(batch_size=16, epochs=1))
    assert any("dropped" in str(w.message) for w in rec)
    batch = _toy_batch(64)  # exact multiple -> no warning
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ppo_update(apply_fn, params, opt_state, tx, batch,
                   jax.random.PRNGKey(0), PPOConfig(batch_size=16, epochs=1))
    assert not any("dropped" in str(w.message) for w in rec)


def test_ppo_logstd_floor_projection():
    """cfg.logstd_min projects the policy's logstd after every optimizer
    step (entropy-collapse guard for the circle_train fine-tune); None
    keeps the reference's unconstrained behavior."""
    import optax

    from rl_collision_avoidance_tpu.algo.ppo import (Batch, PPOConfig,
                                                     ppo_update)
    from rl_collision_avoidance_tpu.models import CNNPolicy

    model = CNNPolicy()
    key = jax.random.PRNGKey(0)
    m, f, b = 8, 3, 32
    params = model.init(key, jnp.zeros((1, f, b)), jnp.zeros((1, 2)),
                        jnp.zeros((1, 2)))
    batch = Batch(
        scans=jax.random.normal(key, (m, f, b)),
        goal=jax.random.normal(key, (m, 2)),
        speed=jnp.zeros((m, 2)),
        action=jax.random.normal(key, (m, 2)),
        logprob=jnp.zeros((m, 1)),
        target=jnp.ones((m, 1)),
        adv=jax.random.normal(key, (m, 1)),
        weight=jnp.ones((m,)),
    )
    cfg = PPOConfig(batch_size=m, epochs=1, logstd_min=0.5)
    tx = optax.adam(cfg.learning_rate)
    p2, _, _ = ppo_update(model.apply, params, tx.init(params), tx, batch,
                          key, cfg)
    np.testing.assert_array_equal(
        np.asarray(p2["params"]["logstd"]), 0.5)  # 0-init, clamped up

    cfg0 = cfg._replace(logstd_min=None)
    p3, _, _ = ppo_update(model.apply, params, tx.init(params), tx, batch,
                          key, cfg0)
    assert np.all(np.asarray(p3["params"]["logstd"]) < 0.5)
