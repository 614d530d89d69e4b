"""Per-robot static-geometry culling — TEST ORACLE.

The production culling layer is the static cell table
(``engine/celltable.py``: exact by construction — every segment within
``max_range`` + slack of a cell is in its list).  This module is the
runtime top-k formulation it superseded, kept as the independent oracle
the cell-table tests check against (``test_pallas.py``): if no robot ever
has more than K segments within range (:func:`max_segments_in_range`),
culled and full raycasts are identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def segment_distances(pos: jnp.ndarray, seg_p: jnp.ndarray, seg_e: jnp.ndarray):
    """(N, 2) positions x (S, 2) segments -> (N, S) point-segment distances."""
    po = pos[:, None, :] - seg_p[None, :, :]
    ee = jnp.sum(seg_e * seg_e, axis=-1)
    t = jnp.sum(po * seg_e[None, :, :], axis=-1) / jnp.maximum(ee, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    closest = seg_p[None] + t[:, :, None] * seg_e[None]
    return jnp.linalg.norm(pos[:, None, :] - closest, axis=-1)


def cull_segments(pos: jnp.ndarray, seg_p: jnp.ndarray, seg_e: jnp.ndarray,
                  seg_valid: jnp.ndarray, k: int):
    """Nearest-K segments per robot, packed for the Pallas kernel.

    Returns (K, N, 4) [px, py, ex, ey] with the loop axis K leading (Mosaic
    requires dynamically indexed axes untiled).  Padding entries and segments
    beyond ``max_range`` culling are made *degenerate* (e = 0, far away) so
    they can never register a hit — the kernel needs no validity mask.
    """
    d = segment_distances(pos, seg_p, seg_e)
    d = jnp.where(seg_valid[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)                      # (N, K)
    packed = jnp.concatenate([seg_p, seg_e], axis=-1)      # (S, 4)
    culled = packed[idx]                                   # (N, K, 4)
    valid = jnp.isfinite(neg_d)
    degenerate = jnp.asarray([1e7, 1e7, 0.0, 0.0], culled.dtype)
    culled = jnp.where(valid[:, :, None], culled, degenerate)
    return jnp.swapaxes(culled, 0, 1)                      # (K, N, 4)


def max_segments_in_range(spec, radius: float, samples: int = 64) -> int:
    """Host-side bound: worst-case number of segments within ``radius`` of
    any point on a sample grid of the world interior.  Used to validate a
    world's ``cull_k`` at build time."""
    seg_p = np.asarray(spec.seg_p)[np.asarray(spec.seg_valid)]
    seg_e = np.asarray(spec.seg_e)[np.asarray(spec.seg_valid)]
    lo = seg_p.min(axis=0)
    hi = (seg_p + seg_e).max(axis=0)
    xs = np.linspace(lo[0], hi[0], samples)
    ys = np.linspace(lo[1], hi[1], samples)
    pts = np.stack(np.meshgrid(xs, ys), axis=-1).reshape(-1, 2)
    worst = 0
    for chunk in np.array_split(pts, max(1, len(pts) // 256)):
        d = np.asarray(segment_distances(jnp.asarray(chunk, jnp.float32),
                                         jnp.asarray(seg_p, jnp.float32),
                                         jnp.asarray(seg_e, jnp.float32)))
        worst = max(worst, int((d <= radius).sum(axis=1).max()))
    return worst
