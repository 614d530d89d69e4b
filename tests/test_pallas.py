"""Fused Pallas lidar (interpret mode on CPU) vs the dense XLA reference,
plus the static cell-table culling layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_collision_avoidance_tpu.engine import make_env
import culling_ref as culling
from rl_collision_avoidance_tpu.engine.celltable import (build_cell_table,
                                                         lookup_cells)
from rl_collision_avoidance_tpu.worlds import circle, mini, stage1, stage2


@pytest.fixture(scope="module")
def envs():
    spec = mini()
    return (make_env(spec, lidar_mode="dense"),
            make_env(spec, lidar_mode="pallas"),
            make_env(spec, lidar_mode="xla"))


def test_scan_obs_backends_match(envs):
    env_d, env_p, env_x = envs
    key = jax.random.PRNGKey(0)
    pose = jax.random.uniform(key, (env_d.n_robots, 3), minval=-8, maxval=8)
    r_d = np.asarray(jax.jit(env_d._scan_obs)(pose[None])[0])
    r_p = np.asarray(jax.jit(env_p._scan_obs)(pose[None])[0])
    r_x = np.asarray(jax.jit(env_x._scan_obs)(pose[None])[0])
    np.testing.assert_allclose(r_d, r_p, atol=1e-5)
    np.testing.assert_allclose(r_d, r_x, atol=1e-5)


def test_env_step_backends_match(envs):
    env_d, env_p, env_x = envs
    key = jax.random.PRNGKey(1)
    sd, _ = jax.jit(env_d.reset1)(key)
    sp, _ = jax.jit(env_p.reset1)(key)
    sx, _ = jax.jit(env_x.reset1)(key)
    act = jnp.tile(jnp.asarray([[0.8, 0.3]]), (env_d.n_robots, 1))
    for _ in range(5):
        sd, od, rd, dd, idd = jax.jit(env_d.step1)(sd, act)
        sp, op, rp, dp, ip = jax.jit(env_p.step1)(sp, act)
        sx, ox, rx, dx, ix = jax.jit(env_x.step1)(sx, act)
    for s2, o2, r2 in ((sp, op, rp), (sx, ox, rx)):
        np.testing.assert_allclose(np.asarray(sd.pose), np.asarray(s2.pose),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rd), np.asarray(r2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(od.scans), np.asarray(o2.scans),
                                   atol=1e-5)


@pytest.mark.parametrize("make_spec", [mini, stage1, stage2, circle],
                         ids=["mini", "stage1", "stage2", "circle"])
def test_cell_table_is_superset_of_range(make_spec):
    """The exactness contract of the static culling layer, enforced for every
    shipped world: the cell table entry for any reachable point contains ALL
    segments within max_range of that point (the kernel then can never miss a
    hit the dense raycast would find)."""
    spec = make_spec()
    ct = build_cell_table(spec.seg_p, spec.seg_e, spec.seg_valid,
                          spec.max_range, cell=1.0)
    sp = spec.seg_p[spec.seg_valid]
    lo = sp.min(axis=0) - 0.5
    hi = (spec.seg_p + spec.seg_e)[spec.seg_valid].max(axis=0) + 0.5
    rng = np.random.default_rng(0)
    pts = rng.uniform(lo, hi, (128, 2)).astype(np.float32)
    cells = np.asarray(lookup_cells(ct, jnp.asarray(pts)))
    d = np.asarray(culling.segment_distances(
        jnp.asarray(pts), jnp.asarray(spec.seg_p), jnp.asarray(spec.seg_e)))
    d = np.where(np.asarray(spec.seg_valid)[None, :], d, np.inf)
    packed = np.concatenate([spec.seg_p, spec.seg_e], -1)
    for i, pt in enumerate(pts):
        within = set(map(tuple, packed[d[i] <= spec.max_range].tolist()))
        entries = set(map(tuple, ct.table[cells[i]].tolist()))
        missing = within - entries
        assert not missing, f"point {pt}: {len(missing)} in-range segs missing"
    # and the worst-case in-range count fits the padded table width
    worst = culling.max_segments_in_range(spec, spec.max_range)
    assert worst <= ct.k, f"worst-case {worst} segments > table K={ct.k}"


def test_dynamic_cull_matches_dense():
    spec = mini()
    env = make_env(spec, use_pallas=False)
    key = jax.random.PRNGKey(2)
    pose = jax.random.uniform(key, (4, 3), minval=-8, maxval=8)
    from rl_collision_avoidance_tpu.engine import lidar
    culled = culling.cull_segments(pose[:, :2], env._seg_p, env._seg_e,
                                   env._seg_valid, 128)  # (K, N, 4)
    dirs = lidar._rotate_beams(pose[:, 2], env._local_dirs)
    full = lidar.raycast_segments(pose[:, :2], dirs, env._seg_p, env._seg_e,
                                  env._seg_valid)
    cu = np.asarray(jnp.swapaxes(culled, 0, 1))  # (N, K, 4)
    for i in range(4):
        sp = jnp.asarray(cu[i, :, :2])
        se = jnp.asarray(cu[i, :, 2:])
        valid = jnp.asarray((cu[i, :, 2] != 0) | (cu[i, :, 3] != 0))
        got = lidar.raycast_segments(pose[None, i, :2], dirs[i:i + 1],
                                     sp, se, valid)
        np.testing.assert_allclose(np.minimum(np.asarray(got[0]), 6.0),
                                   np.minimum(np.asarray(full[i]), 6.0),
                                   atol=1e-5)
