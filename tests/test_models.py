"""Network parity: the flax CNNPolicy must agree numerically with an
independently constructed torch network of the reference architecture
(conv(F->32,k5,s2,p1) -> conv(32->32,k3,s2,p1) -> fc256 -> concat -> fc128 ->
sigmoid/tanh heads; model/net.py:16-80), weights transferred via
utils.torch_interop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_collision_avoidance_tpu.models import CNNPolicy, MLPPolicy, distributions
from rl_collision_avoidance_tpu.utils.torch_interop import (
    flax_params_to_torch_state_dict, torch_state_dict_to_flax)

torch = pytest.importorskip("torch")


def _torch_cnn():
    import torch.nn as nn

    class TorchCNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.logstd = nn.Parameter(torch.zeros(2))
            self.act_fea_cv1 = nn.Conv1d(3, 32, 5, 2, 1)
            self.act_fea_cv2 = nn.Conv1d(32, 32, 3, 2, 1)
            self.act_fc1 = nn.Linear(128 * 32, 256)
            self.act_fc2 = nn.Linear(260, 128)
            self.actor1 = nn.Linear(128, 1)
            self.actor2 = nn.Linear(128, 1)
            self.crt_fea_cv1 = nn.Conv1d(3, 32, 5, 2, 1)
            self.crt_fea_cv2 = nn.Conv1d(32, 32, 3, 2, 1)
            self.crt_fc1 = nn.Linear(128 * 32, 256)
            self.crt_fc2 = nn.Linear(260, 128)
            self.critic = nn.Linear(128, 1)

        def forward(self, x, goal, speed):
            import torch.nn.functional as F
            a = F.relu(self.act_fea_cv1(x))
            a = F.relu(self.act_fea_cv2(a))
            a = a.view(a.shape[0], -1)
            a = F.relu(self.act_fc1(a))
            a = torch.cat((a, goal, speed), dim=-1)
            a = F.relu(self.act_fc2(a))
            mean = torch.cat((torch.sigmoid(self.actor1(a)),
                              torch.tanh(self.actor2(a))), dim=-1)
            v = F.relu(self.crt_fea_cv1(x))
            v = F.relu(self.crt_fea_cv2(v))
            v = v.view(v.shape[0], -1)
            v = F.relu(self.crt_fc1(v))
            v = torch.cat((v, goal, speed), dim=-1)
            v = F.relu(self.crt_fc2(v))
            return self.critic(v), mean

    return TorchCNN()


def test_cnn_matches_torch():
    model = CNNPolicy()
    rng = np.random.default_rng(0)
    scans = rng.standard_normal((5, 3, 512)).astype(np.float32) * 0.3
    goal = rng.standard_normal((5, 2)).astype(np.float32)
    speed = rng.standard_normal((5, 2)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(scans),
                        jnp.asarray(goal), jnp.asarray(speed))
    v_j, mean_j, logstd_j = model.apply(params, jnp.asarray(scans),
                                        jnp.asarray(goal), jnp.asarray(speed))

    tm = _torch_cnn()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_params_to_torch_state_dict(
              jax.device_get(params)).items()}
    tm.load_state_dict(sd)
    with torch.no_grad():
        v_t, mean_t = tm(torch.from_numpy(scans), torch.from_numpy(goal),
                         torch.from_numpy(speed))
    np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=2e-5)


def test_torch_roundtrip():
    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 512)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    sd = flax_params_to_torch_state_dict(jax.device_get(params))
    back = torch_state_dict_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves(jax.device_get(params))
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_log_density_matches_reference_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((7, 2)).astype(np.float32)
    mean = rng.standard_normal((7, 2)).astype(np.float32)
    logstd = np.asarray([0.1, -0.3], np.float32)
    got = np.asarray(distributions.log_normal_density(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(logstd)))
    std = np.exp(logstd)
    want = (-((x - mean) ** 2) / (2 * std**2) - 0.5 * np.log(2 * np.pi)
            - logstd).sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
    ent = float(distributions.entropy(jnp.asarray(logstd)))
    want_ent = (0.5 + 0.5 * np.log(2 * np.pi) + logstd).sum()
    np.testing.assert_allclose(ent, want_ent, rtol=1e-6)


def test_mlp_shapes():
    model = MLPPolicy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, 10)))
    v, mean, logstd = model.apply(params, jnp.ones((3, 10)))
    assert v.shape == (3, 1) and mean.shape == (3, 2) and logstd.shape == (2,)


def test_init_distribution_is_torch_default():
    # kernel entries of Dense(256) drawn from U(+-1/sqrt(4096))
    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 3, 512)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    k = np.asarray(params["params"]["act_trunk"]["Dense_0"]["kernel"])
    bound = 1.0 / np.sqrt(4096)
    assert abs(k).max() <= bound + 1e-8
    assert abs(k).max() > 0.8 * bound  # actually spans the range
    assert abs(k.mean()) < 0.1 * bound


def test_cnn_fused_apply_matches_module():
    """cnn_fused_apply (stacked first convs, one obs read) is numerically
    identical to CNNPolicy.apply on the same params."""
    from rl_collision_avoidance_tpu.models.policy import cnn_fused_apply

    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    scans = jax.random.normal(jax.random.PRNGKey(1), (9, 3, 512))
    goal = jax.random.normal(jax.random.PRNGKey(2), (9, 2))
    speed = jax.random.normal(jax.random.PRNGKey(3), (9, 2))
    v1, m1, l1 = model.apply(params, scans, goal, speed)
    v2, m2, l2 = jax.jit(cnn_fused_apply)(params, scans, goal, speed)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_cnn_matmul_apply_matches_module_and_grads():
    """cnn_matmul_apply (im2col convs -> matmul-only backward) matches
    CNNPolicy.apply in value/mean and in parameter gradients."""
    from rl_collision_avoidance_tpu.models.policy import cnn_matmul_apply

    model = CNNPolicy()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 512)),
                        jnp.zeros((1, 2)), jnp.zeros((1, 2)))
    scans = jax.random.normal(jax.random.PRNGKey(1), (9, 3, 512))
    goal = jax.random.normal(jax.random.PRNGKey(2), (9, 2))
    speed = jax.random.normal(jax.random.PRNGKey(3), (9, 2))
    v1, m1, l1 = model.apply(params, scans, goal, speed)
    v2, m2, l2 = jax.jit(cnn_matmul_apply)(params, scans, goal, speed)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    loss1 = lambda p: ((model.apply(p, scans, goal, speed)[0] ** 2).sum()
                       + (model.apply(p, scans, goal, speed)[1] ** 2).sum())
    loss2 = lambda p: ((cnn_matmul_apply(p, scans, goal, speed)[0] ** 2).sum()
                       + (cnn_matmul_apply(p, scans, goal, speed)[1] ** 2).sum())
    g1 = jax.grad(loss1)(params)
    g2 = jax.grad(loss2)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_trainer_apply_impls_agree():
    """All three Trainer apply implementations produce the same policy
    forward on the mini world's shapes."""
    from rl_collision_avoidance_tpu.train import Trainer, TrainConfig

    outs = {}
    for impl in ("conv", "matmul", "fused"):
        cfg = TrainConfig(world="mini", n_arenas=2, horizon=2,
                          apply_impl=impl)
        tr = Trainer(cfg)
        params = tr.model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 3, 64)), jnp.zeros((1, 2)),
                               jnp.zeros((1, 2)))
        scans = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 64))
        g = jax.random.normal(jax.random.PRNGKey(2), (6, 2))
        s = jax.random.normal(jax.random.PRNGKey(3), (6, 2))
        outs[impl] = tr.apply_fn(params, scans, g, s)
    for impl in ("matmul", "fused"):
        np.testing.assert_allclose(np.asarray(outs["conv"][0]),
                                   np.asarray(outs[impl][0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(outs["conv"][1]),
                                   np.asarray(outs[impl][1]), atol=1e-6)
