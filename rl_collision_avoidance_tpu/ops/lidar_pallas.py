"""Fused Pallas TPU kernel for the 512-beam lidar.

The XLA formulation of the raycast materializes (robots x beams x segments)
intermediates in HBM and is bandwidth-bound (~26 ms for 128 arenas of
stage 1).  This kernel keeps the whole reduction in VMEM: each grid program
computes the (rows, beams) range image for a *group* of arenas by looping
over K culled segments and N robot discs, accumulating an elementwise
minimum.  HBM traffic collapses to inputs + the output.

Performance notes:
  * the inner loop is division-free (one approximate reciprocal);
  * G arenas are stacked along the row axis per program
    (rows = G * n_robots) so the per-iteration loop overhead is amortized
    over 4x-8x more vector work;
  * Mosaic requires dynamically indexed axes untiled (leading), hence the
    culled-segment layout (A/G, K, rows, 4) and the disc-center layout
    (A/G, N, rows, 2);
  * invalid culled entries are degenerate (e = 0, far away) and can never
    hit — no validity mask is needed in-kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8
_BIG = 1e9


def _kernel(pose_ref, segs_ref, centers_ref, dirs_ref, out_ref, *,
            n_robots, n_rows, n_beams, cull_k, radius, max_range,
            use_approx_recip=True, unroll_limit=16):
    x = pose_ref[0, :, 0:1]                   # (R, 1)
    y = pose_ref[0, :, 1:2]
    th = pose_ref[0, :, 2:3]
    lx = dirs_ref[0:1, :]                     # (1, B)
    ly = dirs_ref[1:2, :]
    c = jnp.cos(th)
    s = jnp.sin(th)
    dx = c * lx - s * ly                      # (R, B) world-frame beam dirs
    dy = s * lx + c * ly

    acc0 = jnp.full((n_rows, n_beams), max_range, jnp.float32)

    def seg_body(k, acc):
        # 13-vector-op ray/segment test.  With w = cross(d, e) and
        # c0 = cross(p0 - o, d) (= u * w), the window test u in [0, 1] is the
        # single sign test c0 * (w - c0) >= 0, and the line distance is
        # t = cross(p0 - o, e) / w (one reciprocal, sign-correct both ways).
        seg = segs_ref[0, k]                  # (R, 4) per-row culled segment
        px = seg[:, 0:1] - x                  # (R, 1) segment start - origin
        py = seg[:, 1:2] - y
        ex = seg[:, 2:3]
        ey = seg[:, 3:4]
        w = dx * ey - dy * ex                 # (R, B) cross(d, e)
        c0 = px * dy - py * dx                # (R, B) cross(p0-o, d)
        t_num = px * ey - py * ex             # (R, 1) cross(p0-o, e)
        win = c0 * (w - c0)
        if use_approx_recip:
            t = t_num * pl.reciprocal(w, approx=True)
        else:
            t = t_num / jnp.where(w == 0.0, _EPS, w)
        hit = (win >= 0.0) & (t > _EPS)
        return jnp.minimum(acc, jnp.where(hit, t, _BIG))

    if cull_k <= unroll_limit:
        acc = acc0
        for k in range(cull_k):
            acc = seg_body(k, acc)
    else:
        acc = jax.lax.fori_loop(0, cull_k, seg_body, acc0)

    # Self-exclusion: row r is robot (r mod N) of its arena; excluding a disc
    # is folding +BIG into its c2 term (the discriminant goes negative).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    robot_ids = jax.lax.rem(row_ids, n_robots)

    def disc_body(j, acc):
        cj = centers_ref[0, j]                # (R, 2): target robot j of each
        ocx = cj[:, 0:1] - x                  # row's own arena
        ocy = cj[:, 1:2] - y
        c2 = ocx * ocx + ocy * ocy - radius * radius  # (R, 1)
        c2 = jnp.where(robot_ids == j, _BIG, c2)
        b = dx * ocx + dy * ocy               # (R, B)
        disc = b * b - c2
        t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc > 0.0) & (t > _EPS)
        return jnp.minimum(acc, jnp.where(hit, t, _BIG))

    if n_robots <= unroll_limit:
        for j in range(n_robots):
            acc = disc_body(j, acc)
    else:
        acc = jax.lax.fori_loop(0, n_robots, disc_body, acc)

    out_ref[0] = jnp.minimum(acc, max_range)


def make_scan_fn(n_beams: int, fov: float, radius: float, max_range: float,
                 interpret: bool = False, arenas_per_program: int = 8,
                 unroll_limit: int = 16):
    """Build a jitted (pose (A,N,3), culled (A,K,N,4)) -> (A,N,B) function.

    ``unroll_limit``: loops with at most this many iterations are fully
    unrolled.  Each unrolled iteration keeps one (rows, beams) f32 temporary
    live on the VMEM stack, so rows are capped so that the unrolled stack
    stays under the ~16 MB scoped-VMEM limit.
    """
    from ..engine.lidar import beam_directions_local

    # numpy on purpose: a closed-over jnp array poisons axon dispatch (env.py)
    dirs_t = np.ascontiguousarray(beam_directions_local(n_beams, fov).T)

    @jax.jit
    def scan(pose, culled_segs):
        a, k, n, _ = culled_segs.shape
        g = arenas_per_program
        unrolled = (k if k <= unroll_limit else 0) + (
            n if n <= unroll_limit else 0)
        if unrolled:
            budget = 12 * 2**20  # leave headroom under the 16 MB limit
            # Mosaic keeps ~2 (rows, beams) f32 temporaries live per unrolled
            # iteration plus the loop-carried accumulator set (measured: the
            # old (unrolled + 6) estimate under-counted 2.2x and OOM'd the
            # VMEM stack at A=512, g=8, k=16, n=24 -> 18.6 MB actual).
            while g > 1 and g * n * n_beams * 4 * (2 * unrolled + 16) > budget:
                g //= 2
        while a % g:
            g //= 2
        rows = g * n
        grid = a // g

        pose_r = pose.reshape(grid, rows, 3)
        segs_r = jnp.swapaxes(culled_segs.reshape(grid, g, k, n, 4), 1, 2)
        segs_r = segs_r.reshape(grid, k, rows, 4)
        # centers[b, j, gg*n + i] = pose[b, gg, j, :2]
        xy = pose.reshape(grid, g, n, 3)[..., :2]          # (grid, g, n, 2)
        cent = jnp.swapaxes(xy, 1, 2)                      # (grid, n, g, 2)
        cent = jnp.broadcast_to(cent[:, :, :, None, :],
                                (grid, n, g, n, 2)).reshape(grid, n, rows, 2)

        kern = functools.partial(_kernel, n_robots=n, n_rows=rows,
                                 n_beams=n_beams, cull_k=k, radius=radius,
                                 max_range=max_range,
                                 use_approx_recip=not interpret,
                                 unroll_limit=unroll_limit)
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, rows, 3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, rows, 4), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, rows, 2), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n_beams), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, n_beams), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid, rows, n_beams), jnp.float32),
            interpret=interpret,
        )(pose_r.astype(jnp.float32), segs_r.astype(jnp.float32),
          cent.astype(jnp.float32), dirs_t)
        return out.reshape(a, n, n_beams)

    return scan
