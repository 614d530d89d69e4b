"""Lidar raycast: analytic geometry checks (the hztest/cmdpose idea from the
reference's rostest suite, applied to the pure-function sensor)."""
import jax.numpy as jnp
import numpy as np

from rl_collision_avoidance_tpu.engine import lidar
from rl_collision_avoidance_tpu.worlds.compile import boundary_segments, pack_segments

SEG_P, SEG_E, VALID = (jnp.asarray(a) for a in pack_segments(boundary_segments(20.0, 20.0)))
DIRS = jnp.asarray(lidar.beam_directions_local(64, np.pi))


def _scan(pose, radius=0.22, max_range=6.0):
    return np.asarray(lidar.scan(jnp.asarray(pose), DIRS, SEG_P, SEG_E, VALID,
                                 radius, max_range))


def test_wall_distance_straight_ahead():
    # Robot at (6, 0) facing +x: forward beam (index -1 is +90deg left; the
    # middle beam ~0deg) should hit the x=+10 wall at 4 m.
    pose = np.array([[6.0, 0.0, 0.0]], np.float32)
    r = _scan(pose)
    mid = 32  # angle ~ +pi/128; cos ~ 1
    assert abs(r[0, mid] - 4.0) < 0.02


def test_max_range_cap():
    pose = np.array([[0.0, 0.0, 0.0]], np.float32)  # center: walls 10 m away
    r = _scan(pose)
    np.testing.assert_allclose(r, 6.0)  # everything capped at max range


def test_sideways_beams_hit_side_walls():
    # Robot at center facing +x: beam 0 points to -y (angle -90deg), hits the
    # y=-10 wall at 10 m -> capped to 6; move the robot near the wall instead.
    pose = np.array([[0.0, -8.0, 0.0]], np.float32)
    r = _scan(pose)
    assert abs(r[0, 0] - 2.0) < 0.02       # right beam: wall 2 m below
    assert r[0, -1] == 6.0                  # left beam: wall 18 m above -> cap


def test_robot_disc_hit():
    # Two robots 3 m apart facing each other: forward beam sees the other at
    # 3 - radius.
    pose = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, np.pi]], np.float32)
    r = _scan(pose)
    mid = 32
    expected = 3.0 - 0.22
    assert abs(r[0, mid] - expected) < 0.02
    assert abs(r[1, mid] - expected) < 0.02


def test_heading_rotation():
    # Facing +y, the forward beam from (0, -8) should see the far wall capped;
    # beam 0 (robot right = +x) sees the x=+10 wall at 10 m -> cap; at
    # (8, -8) beam 0 sees it at 2 m.
    pose = np.array([[8.0, -8.0, np.pi / 2]], np.float32)
    r = _scan(pose)
    assert abs(r[0, 0] - 2.0) < 0.02


def test_segment_chunking_consistent():
    # Force the chunked path by replicating segments beyond one chunk and
    # compare with the single-block result.
    segs1 = (SEG_P, SEG_E, VALID)
    seg_p2 = jnp.concatenate([SEG_P] * 3)
    seg_e2 = jnp.concatenate([SEG_E] * 3)
    valid2 = jnp.concatenate([VALID, jnp.zeros_like(VALID), VALID])
    pose = jnp.asarray([[5.0, 2.0, 0.7]], jnp.float32)
    a = lidar.scan(pose, DIRS, *segs1, 0.22, 6.0)
    b = lidar.scan(pose, DIRS, seg_p2, seg_e2, valid2, 0.22, 6.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sparse_beam_index_identity():
    idx = lidar.sparse_beam_index(512, 512)
    np.testing.assert_array_equal(idx, np.arange(512))


def test_sparse_beam_index_matches_reference_walk():
    """Replicates stage_world1.py:122-140's two-pointer loop literally."""
    raw, sparse = 512, 24
    scan = np.arange(raw, dtype=float)
    step = float(raw) / sparse
    left, index = [], 0.0
    for _ in range(sparse // 2):
        left.append(scan[int(index)])
        index += step
    right, index = [], raw - 1.0
    for _ in range(sparse // 2):
        right.append(scan[int(index)])
        index -= step
    want = np.concatenate((left, right[::-1]))
    got = scan[lidar.sparse_beam_index(raw, sparse)]
    np.testing.assert_array_equal(got, want)


def test_env_obs_beams_downsample():
    import dataclasses

    import jax

    from rl_collision_avoidance_tpu.engine import make_env
    from rl_collision_avoidance_tpu.worlds import mini

    spec = dataclasses.replace(mini(), obs_beams=16)
    env = make_env(spec)
    state, obs = jax.jit(env.reset1)(jax.random.PRNGKey(0))
    assert obs.scans.shape == (spec.n_robots, 3, 16)
    full = make_env(mini())
    s2, o2 = jax.jit(full.reset1)(jax.random.PRNGKey(0))
    idx = lidar.sparse_beam_index(spec.n_beams, 16)
    np.testing.assert_allclose(np.asarray(obs.scans[:, -1]),
                               np.asarray(o2.scans[:, -1])[:, idx],
                               atol=1e-6)


def test_rect_silhouette_analytic():
    """raycast_boxes: head-on and lateral hits land on the box faces
    (Stage raytraces the 0.44 x 0.38 footprint; worlds/stage1.world:83)."""
    hl, hw = 0.22, 0.19
    # facing each other along +x: hit at 3 - hl
    pose = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, np.pi]], np.float32)
    r = np.asarray(lidar.scan(jnp.asarray(pose), DIRS, SEG_P, SEG_E, VALID,
                              0.22, 6.0, rect=(hl, hw)))
    mid = 32
    assert abs(r[0, mid] - (3.0 - hl)) < 0.02
    assert abs(r[1, mid] - (3.0 - hl)) < 0.02
    # target turned 90 degrees: its SIDE faces the beam -> hit at 3 - hw
    pose2 = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, np.pi / 2]], np.float32)
    r2 = np.asarray(lidar.scan(jnp.asarray(pose2), DIRS, SEG_P, SEG_E, VALID,
                               0.22, 6.0, rect=(hl, hw)))
    assert abs(r2[0, mid] - (3.0 - hw)) < 0.02


def test_rect_silhouette_matches_segment_oracle():
    """raycast_boxes == raycasting each box's 4 edges as segments."""
    import jax

    hl, hw = 0.22, 0.19
    key = jax.random.PRNGKey(7)
    n = 6
    # non-overlapping placements (a ray STARTING inside another box reports
    # no hit by design, where the edge oracle would see the interior)
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang)], -1)
    heading = np.array(jax.random.uniform(
        key, (n,), minval=-np.pi, maxval=np.pi), np.float32)
    pose = np.concatenate([pos, heading[:, None]], -1).astype(np.float32)
    dirs = np.asarray(lidar._rotate_beams(jnp.asarray(pose[:, 2]), DIRS))

    def box_segments(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        u = np.array([c, s]) * hl
        v = np.array([-s, c]) * hw
        corners = [p[:2] + u + v, p[:2] - u + v,
                   p[:2] - u - v, p[:2] + u - v]
        return [(corners[i], corners[(i + 1) % 4] - corners[i])
                for i in range(4)]

    want = np.full((n, DIRS.shape[0]), 6.0, np.float32)
    for i in range(n):
        segs = [sg for j in range(n) if j != i for sg in box_segments(pose[j])]
        sp = jnp.asarray(np.stack([a for a, _ in segs]).astype(np.float32))
        se = jnp.asarray(np.stack([b for _, b in segs]).astype(np.float32))
        d = lidar.raycast_segments(jnp.asarray(pose[i:i + 1, :2]),
                                   jnp.asarray(dirs[i:i + 1]), sp, se,
                                   jnp.ones(len(segs), bool))
        want[i] = np.minimum(np.asarray(d)[0], 6.0)
    got = np.minimum(np.asarray(lidar.raycast_boxes(
        jnp.asarray(pose), jnp.asarray(dirs[..., 0]),
        jnp.asarray(dirs[..., 1]), hl, hw)), 6.0)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_env_rect_silhouette_xla_matches_dense():
    """footprint="rect" enables the oriented-box silhouette by default, and
    the culled XLA path agrees with the dense path."""
    import dataclasses

    import jax

    from rl_collision_avoidance_tpu.engine.env import Env
    from rl_collision_avoidance_tpu.worlds import mini

    spec = dataclasses.replace(mini(), footprint="rect")
    env_x = Env(spec, lidar_mode="xla")
    env_d = Env(spec, lidar_mode="dense")
    assert env_x.rect_silhouette and env_d.rect_silhouette
    key = jax.random.PRNGKey(11)
    pose = jax.random.uniform(key, (2, spec.n_robots, 3),
                              minval=-2.0, maxval=2.0)
    np.testing.assert_allclose(np.asarray(jax.jit(env_x._raw_scan)(pose)),
                               np.asarray(jax.jit(env_d._raw_scan)(pose)),
                               atol=1e-5)


def test_disc_cull_exact_when_k_covers_neighbors():
    """disc_cull_k (lidar.raycast_culled): k >= N-1 is always bit-identical
    to the exact path, and a small k is identical whenever at most k robots
    are within sensor range of each robot."""
    import jax

    from rl_collision_avoidance_tpu.engine.env import Env
    from rl_collision_avoidance_tpu.worlds import stage1

    spec = stage1()
    env = Env(spec, lidar_mode="xla")
    env_all = Env(spec, lidar_mode="xla", disc_cull_k=spec.n_robots - 1)
    env_k4 = Env(spec, lidar_mode="xla", disc_cull_k=4)
    key = jax.random.PRNGKey(3)
    # random cluster: k = N-1 must match exactly
    pose = jax.random.uniform(key, (2, spec.n_robots, 3),
                              minval=-4.0, maxval=4.0)
    exact = np.asarray(jax.jit(env._raw_scan)(pose))
    allk = np.asarray(jax.jit(env_all._raw_scan)(pose))
    np.testing.assert_array_equal(exact, allk)
    # spread robots >max_range apart: any k is exact (no disc in range)
    n = spec.n_robots
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    spread = np.stack([9.0 * np.cos(ang), 9.0 * np.sin(ang), ang],
                      axis=-1).astype(np.float32)[None]
    exact_s = np.asarray(jax.jit(env._raw_scan)(jnp.asarray(spread)))
    k4_s = np.asarray(jax.jit(env_k4._raw_scan)(jnp.asarray(spread)))
    np.testing.assert_array_equal(exact_s, k4_s)


def test_rect_cull_exact_when_k_covers_neighbors():
    """raycast_boxes_culled (the disc_cull_k analog for rect footprints):
    k = N-1 matches the dense box path everywhere, and a small k matches
    whenever at most k robots are within sensor range."""
    import jax

    hl, hw = 0.22, 0.19
    n = 8
    key = jax.random.PRNGKey(5)
    pose = jax.random.uniform(key, (2, n, 3), minval=-3.0, maxval=3.0)
    th = pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    lx, ly = DIRS[:, 0], DIRS[:, 1]
    dx = c[..., None] * lx - s[..., None] * ly
    dy = s[..., None] * lx + c[..., None] * ly
    dense = np.asarray(jax.jit(lidar.raycast_boxes, static_argnums=(3, 4))(
        pose, dx, dy, hl, hw))
    culled = np.asarray(jax.jit(lidar.raycast_boxes_culled,
                                static_argnums=(3, 4, 5))(
        pose, dx, dy, hl, hw, n - 1))
    np.testing.assert_allclose(culled, dense, atol=1e-6)
    # spread ring, >6 m apart: k=2 already covers every in-range neighbor
    # (clip both to max_range as the env does before comparing)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    spread = jnp.asarray(np.stack(
        [9.0 * np.cos(ang), 9.0 * np.sin(ang), ang], -1,
        dtype=np.float32)[None])
    ths = spread[..., 2]
    cs, ss = jnp.cos(ths), jnp.sin(ths)
    dxs = cs[..., None] * lx - ss[..., None] * ly
    dys = ss[..., None] * lx + cs[..., None] * ly
    dense_s = np.minimum(np.asarray(lidar.raycast_boxes(
        spread, dxs, dys, hl, hw)), 6.0)
    culled_s = np.minimum(np.asarray(lidar.raycast_boxes_culled(
        spread, dxs, dys, hl, hw, 2)), 6.0)
    np.testing.assert_allclose(culled_s, dense_s, atol=1e-6)


def test_env_rect_cull_matches_dense_boxes():
    """Env(footprint=rect, disc_cull_k=N-1) == the uncull'd rect env."""
    import dataclasses

    import jax

    from rl_collision_avoidance_tpu.engine.env import Env
    from rl_collision_avoidance_tpu.worlds import mini

    spec = dataclasses.replace(mini(), footprint="rect")
    env = Env(spec, lidar_mode="xla")
    env_c = Env(spec, lidar_mode="xla", disc_cull_k=spec.n_robots - 1)
    key = jax.random.PRNGKey(13)
    pose = jax.random.uniform(key, (2, spec.n_robots, 3),
                              minval=-2.0, maxval=2.0)
    np.testing.assert_allclose(np.asarray(jax.jit(env._raw_scan)(pose)),
                               np.asarray(jax.jit(env_c._raw_scan)(pose)),
                               atol=1e-5)
