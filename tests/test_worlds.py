"""World compilation: tables, segment extraction, packing."""
import numpy as np

from rl_collision_avoidance_tpu.worlds import (circle_tables, stage2_tables,
                                               mini, stage1, stage2, circle)
from rl_collision_avoidance_tpu.worlds.compile import (
    boundary_segments, occupancy_to_segments, pack_segments, polygon_segments)


def test_circle_tables_match_reference_rows():
    # Spot-check against model/utils.py:6-38 hardcoded values.
    poses, goals = circle_tables()
    np.testing.assert_allclose(poses[0], [25.00, 0.00, np.pi], atol=1e-6)
    np.testing.assert_allclose(poses[1][:2], [24.80, 3.13], atol=1e-6)
    np.testing.assert_allclose(poses[1][2], np.pi * 26 / 25, atol=1e-6)
    np.testing.assert_allclose(poses[13][:2], [-1.57, 24.95], atol=1e-6)
    np.testing.assert_allclose(poses[37][:2], [-1.57, -24.95], atol=1e-6)
    np.testing.assert_allclose(goals[0], [-25.00, 0.00], atol=1e-6)
    np.testing.assert_allclose(goals[3], [-23.24, -9.20], atol=1e-6)
    # goals are the antipodal start positions
    np.testing.assert_allclose(goals, -poses[:, :2], atol=1e-6)


def test_stage2_tables_shapes_and_groups():
    poses, goals, gid = stage2_tables()
    assert poses.shape == (44, 3) and goals.shape == (44, 2)
    # group bounds [0, 6, 10, 15, 19, 24, 34, 44] (model/utils.py:83)
    bounds = [0, 6, 10, 15, 19, 24, 34, 44]
    for g in range(7):
        assert (gid[bounds[g]:bounds[g + 1]] == g).all()
    np.testing.assert_allclose(poses[0], [-7.0, 11.5, np.pi], atol=1e-6)
    np.testing.assert_allclose(goals[0], [-18.0, 11.5], atol=1e-6)


def test_occupancy_to_segments_square():
    grid = np.zeros((4, 4), dtype=bool)
    grid[1:3, 1:3] = True  # 2x2 occupied block
    segs = occupancy_to_segments(grid, (4.0, 4.0))
    # A solid block has exactly 4 maximal boundary segments
    assert len(segs) == 4
    # each of length 2 m
    for p0, p1 in segs:
        length = np.hypot(p1[0] - p0[0], p1[1] - p0[1])
        np.testing.assert_allclose(length, 2.0)


def test_pack_segments_padding():
    segs = boundary_segments(10.0, 10.0)
    seg_p, seg_e, valid = pack_segments(segs)
    assert seg_p.shape[0] % 128 == 0
    assert valid.sum() == 4
    # closed loop: edge vectors sum to zero
    np.testing.assert_allclose(seg_e[valid].sum(axis=0), [0, 0], atol=1e-6)


def test_polygon_segments_stage_normalization():
    # A unit square scaled into 0.7 x 0.7 centered at (2, 3).
    segs = polygon_segments([(0, 0), (1, 0), (1, 1), (0, 1)], (0.7, 0.7), (2, 3))
    pts = np.array([p for p, _ in segs])
    np.testing.assert_allclose(pts.min(axis=0), [2 - 0.35, 3 - 0.35], atol=1e-6)
    np.testing.assert_allclose(pts.max(axis=0), [2 + 0.35, 3 + 0.35], atol=1e-6)


def test_world_builders():
    for spec, n in ((stage1(), 24), (stage2(), 44), (circle(), 50), (mini(), 4)):
        assert spec.n_robots == n
        assert spec.seg_valid.any()
        assert spec.seg_p.shape == spec.seg_e.shape
        # every packed array lane-aligned
        assert spec.seg_p.shape[0] % 128 == 0
    assert stage1().timeout == 150 and stage2().timeout == 200
    assert circle().timeout == 10000 and circle().omega_thresh == 0.7


def test_circle_train_world():
    """Stage-3 fine-tuning world: circle tables + single synchronized
    reset group + pose jitter (worlds/spec.py:circle_train)."""
    import numpy as np

    from rl_collision_avoidance_tpu.worlds import circle, circle_train
    from rl_collision_avoidance_tpu.worlds.spec import ResetMode

    spec = circle_train()
    ref = circle()
    assert spec.n_robots == 50 and spec.n_fixed == 50
    assert spec.reset_mode is ResetMode.TABLES_THEN_CORRIDOR
    assert spec.pose_jitter > 0.0
    assert not spec.dist_prev_zero_on_reset
    assert spec.omega_thresh == ref.omega_thresh == 0.7
    np.testing.assert_array_equal(spec.init_pose_table, ref.init_pose_table)
    np.testing.assert_array_equal(spec.goal_table, ref.goal_table)
    assert np.all(spec.group_id == 0)  # one group: all-done -> ring reset


def test_stage1_rect_world():
    """stage1_rect = stage1 geometry/scenario with the full Stage box
    footprint (collision + silhouettes) — the at-scale rect training
    world (results/stage1_rect_metrics.csv)."""
    from rl_collision_avoidance_tpu.worlds import get_world

    disc = get_world("stage1")
    rect = get_world("stage1_rect")
    assert rect.footprint == "rect" and disc.footprint == "disc"
    assert rect.n_robots == disc.n_robots
    np.testing.assert_array_equal(np.asarray(rect.seg_p),
                                  np.asarray(disc.seg_p))
