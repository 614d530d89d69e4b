"""Pose/goal samplers replacing the reference's unbounded rejection loops
(``stage_world1.py:251-274``, ``stage_world2.py:250-287``) with fixed-shape,
batched equivalents.

Distribution-exact where closed forms exist (uniform-in-disc via polar
inversion); elsewhere K i.i.d. candidates with keep-first-valid, identical in
distribution to loop-until-valid with failure probability < ~1e-4 at the
chosen K.  All samplers are batched over the robot axis: one fused
``jax.random`` call per distribution instead of per-robot key splits (the
reset path runs every step inside the fused env, so threefry volume counts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_K = 32


def _first_valid(cands: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """cands: (..., K, D), valid: (..., K) -> (..., D): first valid candidate
    per row (cands[..., 0, :] when none is)."""
    idx = jnp.argmax(valid, axis=-1)  # first True; 0 when none
    return jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]


def stage1_poses(key, n: int, spawn_radius: float) -> jnp.ndarray:
    """(N, 3) poses uniform in the disc of ``spawn_radius``, heading
    U(0, 2pi) — the exact limit distribution of the reference's
    reject-from-square loop (stage_world1.py:251-260), sampled in closed
    form via polar inversion (r = R*sqrt(u))."""
    u = jax.random.uniform(key, (3, n))
    r = spawn_radius * jnp.sqrt(u[0])
    phi = 2.0 * jnp.pi * u[1]
    theta = 2.0 * jnp.pi * u[2]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), theta], axis=-1)


def stage1_goals(key, pose_xy: jnp.ndarray, spawn_radius: float,
                 dmin: float, dmax: float) -> jnp.ndarray:
    """(N, 2) goals uniform on disc(spawn_radius) ∩ annulus(dmin, dmax)
    around each start (stage_world1.py:262-274).

    Candidates are drawn uniformly on the annulus (polar inversion over
    r^2) and rejected on the disc — the same intersection distribution as
    the reference's reject-from-square loop, at ~3x the per-candidate
    acceptance.  The none-valid fallback (< ~1e-5 per reset) projects the
    first candidate into the disc so the goal is always reachable."""
    n = pose_xy.shape[0]
    u = jax.random.uniform(key, (2, n, _K))
    r = jnp.sqrt(dmin * dmin + u[0] * (dmax * dmax - dmin * dmin))
    phi = 2.0 * jnp.pi * u[1]
    cand = pose_xy[:, None, :] + jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)      # (N, K, 2)
    d_origin = jnp.linalg.norm(cand, axis=-1)
    goal = _first_valid(cand, d_origin <= spawn_radius)
    scale = jnp.minimum(
        1.0, spawn_radius / jnp.maximum(jnp.linalg.norm(goal, axis=-1), 1e-6))
    return goal * scale[:, None]


def _corridor_xy(u_x: jnp.ndarray, u_y: jnp.ndarray) -> jnp.ndarray:
    """The stage-2 south-east corridor's piecewise mapping
    (stage_world2.py:252-257): x ~ U(9,19); u ~ U(0,1); u<=0.4 maps to
    y in [-5,-1], else y in (-19,-13]."""
    x = 9.0 + 10.0 * u_x
    y = jnp.where(u_y <= 0.4, -(u_y * 10.0 + 1.0), -(u_y * 10.0 + 9.0))
    return jnp.stack([x, y], axis=-1)


def corridor_poses(key, cur_xy: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) corridor poses >= 7 m from each current position
    (stage_world2.py:250-268)."""
    n = cur_xy.shape[0]
    u = jax.random.uniform(key, (3, n, _K))
    cand = _corridor_xy(u[0], u[1])                          # (N, K, 2)
    d = jnp.linalg.norm(cand - cur_xy[:, None, :], axis=-1)
    pos = _first_valid(cand, d >= 7.0)
    theta = 2.0 * jnp.pi * u[2, :, 0]
    return jnp.concatenate([pos, theta[:, None]], axis=-1)


def corridor_goals(key, pose_xy: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) corridor goals >= 7 m from each (new) pose
    (stage_world2.py:270-287)."""
    n = pose_xy.shape[0]
    u = jax.random.uniform(key, (2, n, _K))
    cand = _corridor_xy(u[0], u[1])
    d = jnp.linalg.norm(cand - pose_xy[:, None, :], axis=-1)
    return _first_valid(cand, d >= 7.0)


# ---------------------------------------------------------------------------
# Single-robot conveniences (tests; one key -> one sample)
# ---------------------------------------------------------------------------


def stage1_pose(key, spawn_radius: float):
    return stage1_poses(key, 1, spawn_radius)[0]


def stage1_goal(key, pose_xy, spawn_radius: float, dmin: float, dmax: float):
    return stage1_goals(key, pose_xy[None, :], spawn_radius, dmin, dmax)[0]


def corridor_pose(key, cur_xy):
    return corridor_poses(key, cur_xy[None, :])[0]


def corridor_goal(key, pose_xy):
    return corridor_goals(key, pose_xy[None, :])[0]
