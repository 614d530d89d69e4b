"""Differential-drive kinematics and collision (stall) detection.

Replaces libstage's ``drive "diff"`` integration and ``Stalled()`` collision
flag (published as ``is_crashed`` by ``stageros.cpp:560-564``).  Robots are
modeled as discs of radius ``robot_radius`` approximating the reference's
0.44 x 0.38 m footprint (``worlds/stage1.world:83``).

Stall semantics: Stage prevents penetration — a robot whose motion would
collide does not move and raises its stall flag.  Here a colliding candidate
pose reverts to the previous pose (translation and rotation), branchlessly
via ``jnp.where``.
"""
from __future__ import annotations

import jax.numpy as jnp


def integrate(pose: jnp.ndarray, v: jnp.ndarray, w: jnp.ndarray,
              dt: float, substeps: int = 1) -> jnp.ndarray:
    """Kinematic diff-drive update; (N,3) pose, (N,) v forward, (N,) w yaw.

    Each substep translates along the current heading then rotates, mirroring
    Stage's per-update velocity integration at its discrete sim interval.
    """
    h = dt / substeps
    for _ in range(substeps):
        x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
        x = x + v * jnp.cos(th) * h
        y = y + v * jnp.sin(th) * h
        th = th + w * h
        pose = jnp.stack([x, y, th], axis=-1)
    return pose


def wall_collision(pos: jnp.ndarray, seg_p: jnp.ndarray, seg_e: jnp.ndarray,
                   seg_valid: jnp.ndarray, radius: float) -> jnp.ndarray:
    """(N,) bool: does the disc at ``pos`` overlap any static segment?"""
    po = pos[:, None, :] - seg_p[None, :, :]                        # (N,S,2)
    ee = jnp.sum(seg_e * seg_e, axis=-1)                            # (S,)
    tt = jnp.sum(po * seg_e[None, :, :], axis=-1) / jnp.maximum(ee, 1e-12)
    tt = jnp.clip(tt, 0.0, 1.0)
    closest = seg_p[None, :, :] + tt[:, :, None] * seg_e[None, :, :]
    d2 = jnp.sum((pos[:, None, :] - closest) ** 2, axis=-1)         # (N,S)
    hit = (d2 < radius * radius) & seg_valid[None, :]
    return jnp.any(hit, axis=-1)


def wall_collision_packed(pos: jnp.ndarray, culled: jnp.ndarray,
                          radius: float) -> jnp.ndarray:
    """Wall overlap against per-robot candidate segment lists.

    culled: (..., N, K, 4) [px, py, ex, ey] from the static cell table
    (engine/celltable.py); degenerate padding entries are far away and never
    trigger.  Same semantics as :func:`wall_collision`, ~10x less work.
    """
    seg = culled
    sp, se = seg[..., :2], seg[..., 2:]
    po = pos[..., :, None, :] - sp                                  # (...,N,K,2)
    ee = jnp.maximum(jnp.sum(se * se, axis=-1), 1e-12)
    tt = jnp.clip(jnp.sum(po * se, axis=-1) / ee, 0.0, 1.0)
    closest = sp + tt[..., None] * se
    d2 = jnp.sum((pos[..., :, None, :] - closest) ** 2, axis=-1)
    return jnp.any(d2 < radius * radius, axis=-1)


def rect_wall_collision(pose: jnp.ndarray, culled: jnp.ndarray,
                        half_len: float, half_wid: float) -> jnp.ndarray:
    """Oriented-rectangle vs wall-segment overlap, (..., N) bool.

    Stage's robot footprint is a 0.44 x 0.38 m box (worlds/stage1.world:83);
    this is the exact body-frame test: each candidate segment is transformed
    into the robot frame and clipped against the axis-aligned box
    (Liang-Barsky slabs, branchless).

    pose: (..., N, 3); culled: (..., N, K, 4) from the wall cell table —
    which must be built with the rectangle's CIRCUMRADIUS so candidates
    remain a superset.
    """
    c = jnp.cos(pose[..., 2])[..., None]
    s = jnp.sin(pose[..., 2])[..., None]
    rel = culled[..., :2] - pose[..., None, :2]              # (...,N,K,2)
    p0x = rel[..., 0] * c + rel[..., 1] * s                  # body frame
    p0y = -rel[..., 0] * s + rel[..., 1] * c
    ex = culled[..., 2] * c + culled[..., 3] * s
    ey = -culled[..., 2] * s + culled[..., 3] * c

    def slab(p0, e, h):
        e_safe = jnp.where(jnp.abs(e) < 1e-12,
                           jnp.where(e < 0, -1e-12, 1e-12), e)
        t0 = (-h - p0) / e_safe
        t1 = (h - p0) / e_safe
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    nx0, nx1 = slab(p0x, ex, half_len)
    ny0, ny1 = slab(p0y, ey, half_wid)
    t_near = jnp.maximum(jnp.maximum(nx0, ny0), 0.0)
    t_far = jnp.minimum(jnp.minimum(nx1, ny1), 1.0)
    # degenerate padding entries have e = 0 and p0 far outside -> no hit
    hit = t_near <= t_far
    return jnp.any(hit, axis=-1)


def rect_robot_collision(pose: jnp.ndarray, half_len: float,
                         half_wid: float) -> jnp.ndarray:
    """Pairwise oriented-rectangle overlap via the separating-axis test
    (4 candidate axes for two 2-D boxes), self excluded.  (..., N) bool."""
    c = jnp.cos(pose[..., 2])
    s = jnp.sin(pose[..., 2])
    u = jnp.stack([c, s], axis=-1)          # (..., N, 2) body x axis
    v = jnp.stack([-s, c], axis=-1)         # body y axis
    d = pose[..., None, :, :2] - pose[..., :, None, :2]      # (...,N,M,2)

    def separated_on(axis):
        # axis: (..., N, M, 2) unit vectors
        proj_d = jnp.abs(jnp.sum(d * axis, axis=-1))
        ri = (half_len * jnp.abs(jnp.sum(u[..., :, None, :] * axis, -1))
              + half_wid * jnp.abs(jnp.sum(v[..., :, None, :] * axis, -1)))
        rj = (half_len * jnp.abs(jnp.sum(u[..., None, :, :] * axis, -1))
              + half_wid * jnp.abs(jnp.sum(v[..., None, :, :] * axis, -1)))
        return proj_d > ri + rj

    n = pose.shape[-2]
    bc = lambda x: jnp.broadcast_to(x, d.shape)
    sep = (separated_on(bc(u[..., :, None, :]))
           | separated_on(bc(v[..., :, None, :]))
           | separated_on(bc(u[..., None, :, :]))
           | separated_on(bc(v[..., None, :, :])))
    overlap = ~sep & ~jnp.eye(n, dtype=bool)
    return jnp.any(overlap, axis=-1)


def robot_collision(pos: jnp.ndarray, radius: float) -> jnp.ndarray:
    """(..., N) bool: pairwise disc overlap (diameter threshold), self excluded."""
    diff = pos[..., :, None, :] - pos[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    n = pos.shape[-2]
    overlap = (d2 < (2.0 * radius) ** 2) & ~jnp.eye(n, dtype=bool)
    return jnp.any(overlap, axis=-1)


def step_with_stall(pose, v, w, dt, substeps, seg_p, seg_e, seg_valid, radius):
    """Integrate and stall-resolve one control step.

    Returns (new_pose, stalled).  Stalled robots keep their previous pose —
    the positional part of Stage's contact response — and set the crash flag
    consumed by the reward (``stage_world1.py:198-201``).
    """
    cand = integrate(pose, v, w, dt, substeps)
    stalled = wall_collision(cand[:, :2], seg_p, seg_e, seg_valid, radius)
    stalled = stalled | robot_collision(cand[:, :2], radius)
    new_pose = jnp.where(stalled[:, None], pose, cand)
    return new_pose, stalled
