"""Actor-critic policies (flax.linen).

Architecture parity with the reference networks (``model/net.py:16-80`` for
``CNNPolicy``, ``:83-133`` for ``MLPPolicy``): twin 1-D conv encoders over the
stacked lidar frames, goal/speed fusion, sigmoid/tanh action-mean heads and a
state-independent learned log-std.  Initialization reproduces torch's default
(uniform +-1/sqrt(fan_in) for kernels and biases) so learning curves are
comparable.

Shapes: scans (..., F=3, B=512) -> conv over the beam axis.  Convs are
NLC-layout (beams are the spatial axis, frames the channels); with B=512,
k5 s2 p1 then k3 s2 p1 the spatial axis becomes 255 -> 128, giving the
128*32 = 4096 flatten of ``model/net.py:23``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_uniform_init(scale_from_fan_in: bool = True):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's Conv/Linear default."""

    def init(key, shape, dtype=jnp.float32):
        # flax kernels: dense (in, out); conv (k, in, out)
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _bias_init_for(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvTrunk(nn.Module):
    """conv(F->32, k5, s2, p1) -> conv(32->32, k3, s2, p1) -> dense(256).

    Matches the actor/critic feature extractors of ``model/net.py:21-23``.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scans):  # (..., F, B)
        x = jnp.swapaxes(scans, -1, -2).astype(self.dtype)  # (..., B, F)
        f = x.shape[-1]
        x = nn.Conv(32, kernel_size=(5,), strides=(2,), padding=[(1, 1)],
                    kernel_init=torch_uniform_init(),
                    bias_init=_bias_init_for(f * 5), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(32, kernel_size=(3,), strides=(2,), padding=[(1, 1)],
                    kernel_init=torch_uniform_init(),
                    bias_init=_bias_init_for(32 * 3), dtype=self.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(*x.shape[:-2], -1)  # (..., 128*32)
        x = nn.Dense(256, kernel_init=torch_uniform_init(),
                     bias_init=_bias_init_for(x.shape[-1]), dtype=self.dtype)(x)
        return nn.relu(x)


class CNNPolicy(nn.Module):
    """Twin-encoder Gaussian actor-critic (``model/net.py:16-80``).

    __call__(scans, goal, speed) -> (value (...,1), mean (...,2), logstd (2,))
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, scans, goal, speed):
        goal = goal.astype(self.dtype)
        speed = speed.astype(self.dtype)
        logstd = self.param("logstd", nn.initializers.zeros, (2,), jnp.float32)

        a = _ConvTrunk(dtype=self.dtype, name="act_trunk")(scans)
        a = jnp.concatenate([a, goal, speed], axis=-1)
        a = nn.Dense(128, kernel_init=torch_uniform_init(),
                     bias_init=_bias_init_for(260), dtype=self.dtype,
                     name="act_fc2")(a)
        a = nn.relu(a)
        mean_v = nn.sigmoid(nn.Dense(1, kernel_init=torch_uniform_init(),
                                     bias_init=_bias_init_for(128),
                                     dtype=self.dtype, name="actor1")(a))
        mean_w = nn.tanh(nn.Dense(1, kernel_init=torch_uniform_init(),
                                  bias_init=_bias_init_for(128),
                                  dtype=self.dtype, name="actor2")(a))
        mean = jnp.concatenate([mean_v, mean_w], axis=-1)

        c = _ConvTrunk(dtype=self.dtype, name="crt_trunk")(scans)
        c = jnp.concatenate([c, goal, speed], axis=-1)
        c = nn.Dense(128, kernel_init=torch_uniform_init(),
                     bias_init=_bias_init_for(260), dtype=self.dtype,
                     name="crt_fc2")(c)
        c = nn.relu(c)
        value = nn.Dense(1, kernel_init=torch_uniform_init(),
                         bias_init=_bias_init_for(128), dtype=self.dtype,
                         name="critic")(c)
        return value.astype(jnp.float32), mean.astype(jnp.float32), logstd


def cnn_fused_apply(params, scans, goal, speed, dtype=jnp.float32):
    """`CNNPolicy.apply` with the twin trunks' FIRST convs stacked into one.

    The actor and critic encoders both read the full (batch, F, B) scan
    stack — the largest tensor on the acting path; stacking their first
    convs' output channels (F->32 twice becomes F->64 once) halves that HBM
    read while computing identical math.  Everything downstream keeps the
    twin structure (grouped convs / batched fc lower poorly on TPU —
    docs/PERF.md).  Same params pytree as :class:`CNNPolicy`; numerical
    agreement is pinned by tests/test_models.py.
    """
    p = params["params"]

    def conv(x, q, stride):
        y = jax.lax.conv_general_dilated(
            x, q["kernel"].astype(dtype), (stride,), [(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return nn.relu(y + q["bias"].astype(dtype))

    def dense(x, q, act=None):
        y = x @ q["kernel"].astype(dtype) + q["bias"].astype(dtype)
        return act(y) if act is not None else y

    x = jnp.swapaxes(scans, -1, -2).astype(dtype)          # (batch, B, F)
    a_c0 = p["act_trunk"]["Conv_0"]
    c_c0 = p["crt_trunk"]["Conv_0"]
    stacked = {"kernel": jnp.concatenate([a_c0["kernel"], c_c0["kernel"]], -1),
               "bias": jnp.concatenate([a_c0["bias"], c_c0["bias"]])}
    y = conv(x, stacked, 2)                                # (batch, 255, 64)
    half = a_c0["kernel"].shape[-1]

    def trunk(y1, t):
        y2 = conv(y1, t["Conv_1"], 2)                      # (batch, 128, 32)
        flatten = y2.reshape(*y2.shape[:-2], -1)
        return dense(flatten, t["Dense_0"], nn.relu)

    gs = jnp.concatenate([goal.astype(dtype), speed.astype(dtype)], -1)
    a = trunk(y[..., :half], p["act_trunk"])
    a = dense(jnp.concatenate([a, gs], -1), p["act_fc2"], nn.relu)
    mean = jnp.concatenate([nn.sigmoid(dense(a, p["actor1"])),
                            nn.tanh(dense(a, p["actor2"]))], -1)
    c = trunk(y[..., half:], p["crt_trunk"])
    c = dense(jnp.concatenate([c, gs], -1), p["crt_fc2"], nn.relu)
    value = dense(c, p["critic"])
    return (value.astype(jnp.float32), mean.astype(jnp.float32),
            p["logstd"])


def _im2col_1d(x, k: int, stride: int, pad: int):
    """(..., L, C) -> (..., L_out, k*C) patch matrix via k strided slices.

    Lowers a 1-D conv to one matmul: TPU/XLA compiles the conv op's
    *backward* (filter/input gradients of tiny-channel convs) poorly,
    while slice+concat+dot differentiates into pad+add and plain matmuls
    that run at MXU rates (docs/PERF.md, update-phase table).
    """
    L = x.shape[-2]
    L_out = (L + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
    cols = [xp[..., j:j + (L_out - 1) * stride + 1:stride, :]
            for j in range(k)]
    return jnp.concatenate(cols, axis=-1)  # (..., L_out, k*C)


def cnn_matmul_apply(params, scans, goal, speed, dtype=jnp.float32):
    """`CNNPolicy.apply` with both convs lowered to im2col matmuls.

    Numerically equivalent (same multiply-accumulates, reassociated) with
    the same params pytree; exists because `lax.conv` WITH GRADIENTS is the
    training-throughput bottleneck: the conv filter/input-gradient kernels
    for these tiny-channel convs run ~10x below matmul rates on TPU, while
    this formulation's backward is pure matmul + pad-add.  Use for the PPO
    update path; agreement is pinned by tests/test_models.py.
    """
    p = params["params"]

    def dense(x, q, act=None):
        y = x @ q["kernel"].astype(dtype) + q["bias"].astype(dtype)
        return act(y) if act is not None else y

    def trunk(x, t):
        # conv1 k5 s2 p1: (B, 512, F) -> (B, 255, 32)
        c1 = t["Conv_0"]
        w1 = c1["kernel"].astype(dtype)            # (5, F, 32)
        y = _im2col_1d(x, 5, 2, 1) @ w1.reshape(-1, w1.shape[-1])
        y = nn.relu(y + c1["bias"].astype(dtype))
        # conv2 k3 s2 p1: (B, 255, 32) -> (B, 128, 32)
        c2 = t["Conv_1"]
        w2 = c2["kernel"].astype(dtype)            # (3, 32, 32)
        y = _im2col_1d(y, 3, 2, 1) @ w2.reshape(-1, w2.shape[-1])
        y = nn.relu(y + c2["bias"].astype(dtype))
        flat = y.reshape(*y.shape[:-2], -1)        # (B, 4096)
        return dense(flat, t["Dense_0"], nn.relu)

    x = jnp.swapaxes(scans, -1, -2).astype(dtype)  # (B, 512, F)
    gs = jnp.concatenate([goal.astype(dtype), speed.astype(dtype)], -1)
    a = trunk(x, p["act_trunk"])
    a = dense(jnp.concatenate([a, gs], -1), p["act_fc2"], nn.relu)
    mean = jnp.concatenate([nn.sigmoid(dense(a, p["actor1"])),
                            nn.tanh(dense(a, p["actor2"]))], -1)
    c = trunk(x, p["crt_trunk"])
    c = dense(jnp.concatenate([c, gs], -1), p["crt_fc2"], nn.relu)
    value = dense(c, p["critic"])
    return (value.astype(jnp.float32), mean.astype(jnp.float32),
            p["logstd"])


class MLPPolicy(nn.Module):
    """Small MLP alternative (``model/net.py:83-133``); obs is a flat vector."""
    action_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        obs = obs.astype(self.dtype)
        logstd = self.param("logstd", nn.initializers.zeros,
                            (self.action_dim,), jnp.float32)

        def dense(n, x, scale=1.0, name=None):
            fan_in = x.shape[-1]

            def kinit(key, shape, dtype=jnp.float32):
                return torch_uniform_init()(key, shape, dtype) * scale

            return nn.Dense(n, kernel_init=kinit,
                            bias_init=_bias_init_for(fan_in),
                            dtype=self.dtype, name=name)(x)

        a = jnp.tanh(dense(64, obs, name="act_fc1"))
        a = jnp.tanh(dense(128, a, name="act_fc2"))
        mean = dense(self.action_dim, a, scale=0.1, name="mu")

        v = jnp.tanh(dense(64, obs, name="value_fc1"))
        v = jnp.tanh(dense(128, v, name="value_fc2"))
        # Note: the reference calls the out-of-place ``mul`` on value_fc3
        # (model/net.py:98), so its value head is *not* actually rescaled;
        # reproduced here with scale=1.
        value = dense(1, v, scale=1.0, name="value_fc3")
        return value.astype(jnp.float32), mean.astype(jnp.float32), logstd
