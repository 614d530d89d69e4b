"""Diff-drive integration and stall semantics — the pure-function versions of
the reference's behavioral rostests (cmdpose_tests.py:87-133: drive forward =>
only x changes; turn in place => only heading changes)."""
import jax.numpy as jnp
import numpy as np

from rl_collision_avoidance_tpu.engine import physics
from rl_collision_avoidance_tpu.worlds.compile import boundary_segments, pack_segments

SEG_P, SEG_E, VALID = (jnp.asarray(a) for a in pack_segments(boundary_segments(20.0, 20.0)))


def test_drive_forward_only_x():
    pose = jnp.asarray([[0.0, 0.0, 0.0]])
    new = physics.integrate(pose, jnp.asarray([0.5]), jnp.asarray([0.0]), 0.1)
    np.testing.assert_allclose(np.asarray(new), [[0.05, 0.0, 0.0]], atol=1e-7)


def test_turn_in_place_only_theta():
    pose = jnp.asarray([[1.0, 2.0, 0.5]])
    new = physics.integrate(pose, jnp.asarray([0.0]), jnp.asarray([0.8]), 0.1)
    np.testing.assert_allclose(np.asarray(new), [[1.0, 2.0, 0.58]], atol=1e-7)


def test_substeps_curve():
    # With substeps the trajectory curves; analytically the exact diff-drive
    # arc for v=1, w=1, t=1 ends at (sin 1, 1 - cos 1).  Many substeps should
    # approach it.
    pose = jnp.asarray([[0.0, 0.0, 0.0]])
    new = physics.integrate(pose, jnp.asarray([1.0]), jnp.asarray([1.0]),
                            1.0, substeps=1000)
    np.testing.assert_allclose(np.asarray(new)[0, :2],
                               [np.sin(1.0), 1 - np.cos(1.0)], atol=2e-3)


def test_wall_stall():
    # Driving into the x=+10 wall from 0.25 m away: candidate pose would put
    # the disc (r=0.22) in contact -> stall, pose unchanged, crash flag set.
    pose = jnp.asarray([[9.75, 0.0, 0.0]])
    new, stalled = physics.step_with_stall(
        pose, jnp.asarray([1.0]), jnp.asarray([0.0]), 0.1, 1,
        SEG_P, SEG_E, VALID, 0.22)
    assert bool(stalled[0])
    np.testing.assert_allclose(np.asarray(new), np.asarray(pose))


def test_robot_robot_stall():
    # Two robots closing head-on from 0.5 m: after one step the gap would be
    # 0.3 < 2r = 0.44 -> both stall.
    pose = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, np.pi]])
    v = jnp.asarray([1.0, 1.0])
    w = jnp.zeros(2)
    new, stalled = physics.step_with_stall(pose, v, w, 0.1, 1,
                                           SEG_P, SEG_E, VALID, 0.22)
    assert bool(stalled[0]) and bool(stalled[1])
    np.testing.assert_allclose(np.asarray(new), np.asarray(pose))


def test_free_motion_no_stall():
    pose = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 1.0]])
    new, stalled = physics.step_with_stall(
        pose, jnp.asarray([1.0, 0.3]), jnp.asarray([0.1, -0.2]), 0.1, 1,
        SEG_P, SEG_E, VALID, 0.22)
    assert not bool(stalled.any())
    assert not np.allclose(np.asarray(new), np.asarray(pose))


def test_rect_wall_collision_discriminates_from_disc():
    """The 0.44 x 0.38 box (stage1.world:83) vs the 0.22 disc: a wall at
    lateral distance 0.20 hits the disc but clears the box's 0.19 half-width;
    a wall 0.21 ahead hits both."""
    from rl_collision_avoidance_tpu.engine.physics import (
        rect_wall_collision, wall_collision_packed)
    hl, hw = 0.22, 0.19

    def seg(px, py, ex, ey):
        return jnp.asarray([[[[px, py, ex, ey]]]], jnp.float32)  # (1,1,1,4)

    pose = jnp.asarray([[[0.0, 0.0, 0.0]]])          # (1,1,3), theta=0
    side = seg(-1.0, 0.20, 2.0, 0.0)                  # y = 0.20 horizontal
    front = seg(0.21, -1.0, 0.0, 2.0)                 # x = 0.21 vertical
    assert not bool(rect_wall_collision(pose, side, hl, hw)[0, 0])
    assert bool(wall_collision_packed(pose[..., :2], side, 0.22)[0, 0])
    assert bool(rect_wall_collision(pose, front, hl, hw)[0, 0])
    # rotate 90 degrees: the long side now faces y, so y=0.20 hits
    pose90 = jnp.asarray([[[0.0, 0.0, np.pi / 2]]])
    assert bool(rect_wall_collision(pose90, side, hl, hw)[0, 0])
    assert not bool(rect_wall_collision(pose90, seg(0.21, -1.0, 0.0, 2.0),
                                        hl, hw)[0, 0])


def test_rect_robot_collision_sat():
    from rl_collision_avoidance_tpu.engine.physics import (
        rect_robot_collision, robot_collision)
    hl, hw = 0.22, 0.19
    # two aligned boxes 0.39 apart laterally: boxes clear (2*0.19 = 0.38),
    # discs of r=0.22 overlap (0.39 < 0.44)
    pose = jnp.asarray([[[0.0, 0.0, 0.0], [0.0, 0.39, 0.0]]])
    assert not bool(rect_robot_collision(pose, hl, hw).any())
    assert bool(robot_collision(pose[..., :2], 0.22).any())
    # head-on 0.43 apart along x: boxes overlap (2*0.22 = 0.44 > 0.43)
    pose2 = jnp.asarray([[[0.0, 0.0, 0.0], [0.43, 0.0, 0.0]]])
    assert bool(rect_robot_collision(pose2, hl, hw).any())
    # one rotated 90 degrees at 0.42 along x: 0.22 + 0.19 = 0.41 < 0.42
    pose3 = jnp.asarray([[[0.0, 0.0, 0.0], [0.42, 0.0, np.pi / 2]]])
    assert not bool(rect_robot_collision(pose3, hl, hw).any())


def test_env_rect_footprint_steps():
    import dataclasses

    import jax

    from rl_collision_avoidance_tpu.engine import make_env
    from rl_collision_avoidance_tpu.worlds import mini

    spec = dataclasses.replace(mini(), footprint="rect")
    env = make_env(spec, lidar_mode="xla")
    state, obs = jax.jit(env.reset1)(jax.random.PRNGKey(0))
    act = jnp.tile(jnp.asarray([[1.0, 0.0]]), (spec.n_robots, 1))
    state, obs, r, done, info = jax.jit(env.step1)(state, act)
    assert np.isfinite(np.asarray(r)).all()
