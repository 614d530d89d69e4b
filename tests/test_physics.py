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
