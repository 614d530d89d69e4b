"""Clipped-PPO update, fully on device.

Reproduces ``model/ppo.py:143-259`` (``ppo_update_stage1/2``): advantage
normalization over the whole rollout, epochs of randomly permuted minibatches,
ratio clipping, and the loss ``policy + 20 * value - coeff_entropy * entropy``.
Differences by design:
  * minibatch iteration is a ``lax.scan`` over an on-device permutation
    (no host loop, no host<->device copies per minibatch);
  * stage-2's ``np.delete`` of dead-robot transitions (``model/ppo.py:212-218``,
    ``model/utils.py:65-78``) becomes a per-sample weight mask — identical
    gradient direction without dynamic shapes.
"""
from __future__ import annotations

import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import distributions


def _warn_dropped(m: int, used: int, batch_size: int):
    """Shapes are static, so this fires at trace time, not per step.

    Reference stage-1 keeps the remainder minibatch (drop_last=False,
    ``model/ppo.py:161``); here a fixed minibatch count is required for the
    on-device scan, so the remainder is re-drawn into no minibatch.  Exact
    for every preset config (rollouts are multiples of the batch size) —
    warn loudly for custom shapes instead of silently losing data."""
    if used < m:
        warnings.warn(
            f"PPO rollout of {m} samples is not divisible by batch_size "
            f"{batch_size}: {m - used} samples per epoch are dropped "
            "(the reference's stage-1 drop_last=False would keep them)",
            stacklevel=3)


class PPOConfig(NamedTuple):
    batch_size: int = 1024
    epochs: int = 2
    clip_value: float = 0.1
    coeff_entropy: float = 5e-4
    value_coeff: float = 20.0
    learning_rate: float = 5e-5
    # Floor for the state-independent logstd parameter, applied as a
    # projection after every optimizer step.  None = parity (the reference
    # has no floor; its stage-2 logstd collapses to ~-3 over 1600 updates,
    # results/stage2_metrics.csv, killing exploration).  The circle_train
    # fine-tune sets e.g. log(0.15) to keep a minimum exploration noise.
    logstd_min: float | None = None


def _clamp_logstd(params, lo: float):
    """Project the policy's logstd parameter onto [lo, inf)."""
    def clamp(path, x):
        if any(getattr(p, "key", None) == "logstd" for p in path):
            return jnp.maximum(x, lo)
        return x
    return jax.tree_util.tree_map_with_path(clamp, params)


class Batch(NamedTuple):
    """Flattened rollout, leading axis M = horizon * num_env."""
    scans: jnp.ndarray     # (M, F, B)
    goal: jnp.ndarray      # (M, 2)
    speed: jnp.ndarray     # (M, 2)
    action: jnp.ndarray    # (M, 2) raw (unclipped) samples, as the reference
    logprob: jnp.ndarray   # (M, 1) behavior log-prob
    target: jnp.ndarray    # (M, 1)
    adv: jnp.ndarray       # (M, 1) already normalized
    weight: jnp.ndarray    # (M,) 1.0 = train on it, 0.0 = masked out


def normalize_advantages(advs: jnp.ndarray) -> jnp.ndarray:
    """(advs - mean)/std over the *full* rollout — the reference normalizes
    before any filtering (``model/ppo.py:148``, population std)."""
    return (advs - jnp.mean(advs)) / jnp.std(advs)


def ppo_loss(apply_fn, params, mb: Batch, cfg: PPOConfig):
    value, mean, logstd = apply_fn(params, mb.scans, mb.goal, mb.speed)
    new_logprob = distributions.log_normal_density(mb.action, mean, logstd)
    ratio = jnp.exp(new_logprob - mb.logprob)            # (B, 1)
    adv = mb.adv
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_value, 1.0 + cfg.clip_value) * adv
    w = mb.weight[:, None]
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    policy_loss = -jnp.sum(jnp.minimum(surr1, surr2) * w) / wsum
    value_loss = jnp.sum((value - mb.target) ** 2 * w) / wsum
    ent = distributions.entropy(logstd)                  # scalar per sample
    loss = (policy_loss + cfg.value_coeff * value_loss
            - cfg.coeff_entropy * ent)
    return loss, (policy_loss, value_loss, ent)


def ppo_update_sharded(apply_fn, params, opt_state, tx, batch: Batch, key,
                       cfg: PPOConfig, mesh, data_axis: str = "data"):
    """PPO epochs with per-shard minibatch permutation and explicit psum.

    The reference shuffles the whole rollout on its single learner
    (``model/ppo.py:161-163`` SubsetRandomSampler); with arenas sharded over
    devices a *global* permutation would regather every minibatch across the
    mesh (an all-to-all per SGD step).  Here each device permutes only its
    local samples — every minibatch takes an equal stratum from each shard —
    and the only cross-device traffic is one gradient ``psum`` per minibatch,
    riding ICI.  Statistically this is stratified sampling of the same
    batch; for a single minibatch covering the whole rollout it is *exactly*
    the unsharded update (tested in tests/test_sharding.py).

    The batch's leading axis must be shard-contiguous (arena-major
    flattening, see ``Trainer._train_step``) and divisible by the mesh size;
    ``cfg.batch_size`` is the global minibatch size.
    """
    import inspect

    import numpy as np
    from jax.sharding import PartitionSpec as P

    shard_map = jax.shard_map if hasattr(jax, "shard_map") else (
        __import__("jax.experimental.shard_map", fromlist=["shard_map"]).shard_map)
    _sig = inspect.signature(shard_map).parameters
    _check_kw = ({"check_vma": False} if "check_vma" in _sig
                 else {"check_rep": False} if "check_rep" in _sig else {})

    n_dev = int(np.prod([mesh.shape[a] for a in (data_axis,)]))
    m = batch.scans.shape[0]
    assert m % n_dev == 0 and cfg.batch_size % n_dev == 0
    m_local = m // n_dev
    n_mb = m // cfg.batch_size
    assert n_mb > 0, "batch_size larger than rollout"
    bs_local = cfg.batch_size // n_dev
    used = n_mb * bs_local
    _warn_dropped(m, used * n_dev, cfg.batch_size)

    def local_update(params, opt_state, lbatch, key):
        ax = jax.lax.axis_index(data_axis)
        key = jax.random.fold_in(key, ax)

        def loss_local(p, mb, wsum):
            value, mean, logstd = apply_fn(p, mb.scans, mb.goal, mb.speed)
            new_logprob = distributions.log_normal_density(
                mb.action, mean, logstd)
            ratio = jnp.exp(new_logprob - mb.logprob)
            surr1 = ratio * mb.adv
            surr2 = jnp.clip(ratio, 1.0 - cfg.clip_value,
                             1.0 + cfg.clip_value) * mb.adv
            w = mb.weight[:, None]
            policy_loss = -jnp.sum(jnp.minimum(surr1, surr2) * w) / wsum
            value_loss = jnp.sum((value - mb.target) ** 2 * w) / wsum
            ent = distributions.entropy(logstd)
            # the entropy term is state-independent and identical on every
            # device; weight it 1/n_dev so the psum of local grads matches
            # the unsharded loss exactly
            loss = (policy_loss + cfg.value_coeff * value_loss
                    - cfg.coeff_entropy * ent / n_dev)
            return loss, (policy_loss, value_loss, ent / n_dev)

        grad_fn = jax.grad(loss_local, has_aux=True)

        def minibatch_step(carry, idx):
            params, opt_state = carry
            mb = jax.tree_util.tree_map(
                lambda x: jnp.take(x, idx, axis=0), lbatch)
            wsum = jax.lax.psum(jnp.sum(mb.weight), data_axis)
            wsum = jnp.maximum(wsum, 1.0)
            grads, aux = grad_fn(params, mb, wsum)
            grads = jax.lax.psum(grads, data_axis)
            aux = jax.lax.psum(jnp.stack(aux), data_axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if cfg.logstd_min is not None:
                params = _clamp_logstd(params, cfg.logstd_min)
            return (params, opt_state), aux

        def epoch_step(carry, k):
            perm = jax.random.permutation(k, m_local)[:used]
            idxs = perm.reshape(n_mb, bs_local)
            carry, aux = jax.lax.scan(minibatch_step, carry, idxs)
            return carry, aux

        keys = jax.random.split(key, cfg.epochs)
        (params, opt_state), aux = jax.lax.scan(
            epoch_step, (params, opt_state), keys)
        return params, opt_state, aux

    run = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P()),
        out_specs=(P(), P(), P()),
        **_check_kw,
    )
    params, opt_state, aux = run(params, opt_state, batch, key)
    metrics = jnp.mean(aux.reshape(-1, 3), axis=0)
    return params, opt_state, {
        "policy_loss": metrics[0],
        "value_loss": metrics[1],
        "entropy": metrics[2],
    }


def ppo_update(apply_fn, params, opt_state, tx, batch: Batch, key,
               cfg: PPOConfig):
    """Run ``cfg.epochs`` x shuffled minibatches of PPO SGD.

    Returns (params, opt_state, metrics) where metrics are means over all
    minibatches of (policy_loss, value_loss, entropy) — the reference's
    ``ppo.log`` stream (``model/ppo.py:189-192``).
    """
    m = batch.scans.shape[0]
    n_mb = m // cfg.batch_size
    assert n_mb > 0, "batch_size larger than rollout"
    used = n_mb * cfg.batch_size
    _warn_dropped(m, used, cfg.batch_size)

    grad_fn = jax.grad(lambda p, mb: ppo_loss(apply_fn, p, mb, cfg),
                       has_aux=True)

    def minibatch_step(carry, idx):
        params, opt_state = carry
        mb = jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), batch)
        grads, aux = grad_fn(params, mb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if cfg.logstd_min is not None:
            params = _clamp_logstd(params, cfg.logstd_min)
        return (params, opt_state), jnp.stack(aux)

    def epoch_step(carry, k):
        perm = jax.random.permutation(k, m)[:used]
        idxs = perm.reshape(n_mb, cfg.batch_size)
        carry, aux = jax.lax.scan(minibatch_step, carry, idxs)
        return carry, aux

    keys = jax.random.split(key, cfg.epochs)
    (params, opt_state), aux = jax.lax.scan(epoch_step, (params, opt_state),
                                            keys)
    metrics = jnp.mean(aux.reshape(-1, 3), axis=0)
    return params, opt_state, {
        "policy_loss": metrics[0],
        "value_loss": metrics[1],
        "entropy": metrics[2],
    }
