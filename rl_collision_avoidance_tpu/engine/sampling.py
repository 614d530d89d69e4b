"""Fixed-trip-count pose/goal samplers replacing the reference's unbounded
rejection loops (``stage_world1.py:251-274``, ``stage_world2.py:250-287``).

Each sampler draws K i.i.d. candidates and keeps the first valid one —
identical in distribution to loop-until-valid, but with static shapes so the
whole reset path stays inside jit.  If no candidate is valid (probability
< 1e-3 at the chosen K) the first candidate is used.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_K = 32


def _first_valid(cands: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """cands: (K, D), valid: (K,) -> (D,) first valid candidate (else cands[0])."""
    idx = jnp.argmax(valid)  # first True; 0 when none
    return cands[idx]


def stage1_pose(key, spawn_radius: float):
    """Uniform pose in the disc of ``spawn_radius`` (stage_world1.py:251-260)."""
    kxy, kth = jax.random.split(key)
    xy = jax.random.uniform(kxy, (_K, 2), minval=-spawn_radius, maxval=spawn_radius)
    valid = jnp.sum(xy * xy, axis=-1) <= spawn_radius**2
    pos = _first_valid(xy, valid)
    theta = jax.random.uniform(kth, (), minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.array([pos[0], pos[1], theta])


def stage1_goal(key, pose_xy, spawn_radius: float, dmin: float, dmax: float):
    """Goal in the disc, 8-10 m from the start pose (stage_world1.py:262-274)."""
    xy = jax.random.uniform(key, (_K, 2), minval=-spawn_radius, maxval=spawn_radius)
    d_origin = jnp.sqrt(jnp.sum(xy * xy, axis=-1))
    d_start = jnp.sqrt(jnp.sum((xy - pose_xy[None, :]) ** 2, axis=-1))
    valid = (d_origin <= spawn_radius) & (d_start >= dmin) & (d_start <= dmax)
    return _first_valid(xy, valid)


def _corridor_xy(key):
    """The stage-2 south-east corridor sampler's piecewise y mapping
    (stage_world2.py:252-257): x ~ U(9,19); u ~ U(0,1); u<=0.4 maps to
    y in [-5,-1], else y in (-19,-13]."""
    kx, ky = jax.random.split(key)
    x = jax.random.uniform(kx, (_K,), minval=9.0, maxval=19.0)
    u = jax.random.uniform(ky, (_K,))
    y = jnp.where(u <= 0.4, -(u * 10.0 + 1.0), -(u * 10.0 + 9.0))
    return jnp.stack([x, y], axis=-1)


def corridor_pose(key, cur_xy):
    """Random corridor pose >= 7 m from the current position
    (stage_world2.py:250-268)."""
    kxy, kth = jax.random.split(key)
    xy = _corridor_xy(kxy)
    d = jnp.sqrt(jnp.sum((xy - cur_xy[None, :]) ** 2, axis=-1))
    pos = _first_valid(xy, d >= 7.0)
    theta = jax.random.uniform(kth, (), minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.array([pos[0], pos[1], theta])


def corridor_goal(key, pose_xy):
    """Random corridor goal >= 7 m from the (new) pose (stage_world2.py:270-287)."""
    xy = _corridor_xy(key)
    d = jnp.sqrt(jnp.sum((xy - pose_xy[None, :]) ** 2, axis=-1))
    return _first_valid(xy, d >= 7.0)
