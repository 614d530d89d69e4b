"""World specifications compiled to device-ready arrays.

The reference keeps world geometry in Stage ``.world`` files plus occupancy
bitmaps (``/root/reference/worlds/stage1.world``, ``stage2.world``,
``circle.world``) and scenario tables in ``model/utils.py:6-63``.  Here every
workload compiles, once and host-side, into a :class:`WorldSpec`: static
line-segment geometry (for lidar raycast and wall collision), per-robot
scenario tables, sensor constants and reward/termination parameters.  The
simulation itself (``engine/``) is a pure function of these arrays — the
TPU-native replacement for libstage + stageros.
"""
from __future__ import annotations

import dataclasses
import enum
import os
from functools import lru_cache

import numpy as np

from .compile import (
    boundary_segments,
    pack_segments,
    polygon_segments,
    segments_from_bitmap,
)

_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


class ResetMode(enum.Enum):
    """How robots obtain fresh poses/goals when an episode (re)starts."""

    #: Uniform random pose in a disc, goal 8–10 m away (stage_world1.py:251-274).
    RANDOM_DISC = 0
    #: Fixed tables for robots [0, n_fixed); corridor sampler for the rest
    #: (stage_world2.py:210-214, 164-168, 250-287).
    TABLES_THEN_CORRIDOR = 1
    #: Fixed circle-swap tables, never randomized (circle_world.py:205-208).
    FIXED_TABLES = 2


@dataclasses.dataclass(frozen=True)
class WorldSpec:
    """Immutable, host-side description of one workload's world.

    All array members are numpy; the engine moves them to device once.
    """

    name: str
    n_robots: int

    # --- static geometry (padded to a fixed segment count) ---
    seg_p: np.ndarray  # (S, 2) f32 segment start points
    seg_e: np.ndarray  # (S, 2) f32 segment edge vectors (end - start)
    seg_valid: np.ndarray  # (S,) bool padding mask

    # --- robot / sensor constants (worlds/stage1.world:8-15,83) ---
    robot_radius: float = 0.22  # disc approx of the 0.44 x 0.38 footprint
    # Collision footprint: "disc" (radius above, the fast default) or
    # "rect" — Stage's exact 0.44 x 0.38 m oriented box (stage1.world:83)
    # for wall and robot-robot collision.  Lidar silhouettes remain discs
    # either way (see PARITY.md).
    footprint: str = "disc"
    rect_half_len: float = 0.22  # half of `size [0.44 0.38 0.22]` x
    rect_half_wid: float = 0.19  # half of its y
    n_beams: int = 512
    fov: float = np.pi  # 180 degrees
    max_range: float = 6.0
    laser_frames: int = 3  # stacked lidar history (ppo_stage1.py:24)
    # Observation beam count after the reference's sparse left/right
    # resample (stage_world1.py:122-140); None = all n_beams (the
    # reference's configs use beam_num == samples == 512, an identity).
    obs_beams: int | None = None

    # --- timing: one policy step integrates `substeps` x `dt` seconds ---
    dt: float = 0.1
    substeps: int = 1

    # --- reward / termination (stage_world1.py:180-211 and variants) ---
    goal_size: float = 0.5
    omega_thresh: float = 1.05  # |w| beyond which spin is penalized
    timeout: int = 150  # steps; terminal when t > timeout

    # When an episode starts the reference seeds the previous goal-distance
    # either with the true distance (stage 1, stage_world1.py:171-177) or with
    # 0 (stage 2 / circle, stage_world2.py:164-171), which makes the first
    # step's progress reward strongly negative.  Kept for parity.
    dist_prev_zero_on_reset: bool = False

    reset_mode: ResetMode = ResetMode.RANDOM_DISC
    # RANDOM_DISC parameters
    spawn_radius: float = 9.0
    goal_dist_min: float = 8.0
    goal_dist_max: float = 10.0
    # Scenario tables (unused entries are zero): (N, 3) poses, (N, 2) goals
    init_pose_table: np.ndarray | None = None
    goal_table: np.ndarray | None = None
    n_fixed: int = 0  # robots [0, n_fixed) use the tables in TABLES_THEN_CORRIDOR
    # Uniform +-pose_jitter (m) added per-robot to table x/y at every reset.
    # 0.0 = exact tables (all parity worlds).  Used by the circle_train
    # fine-tuning world: the exact circle scenario is rotationally symmetric
    # and deterministic-lockstep-degenerate (PARITY.md), so training sees the
    # jittered task the evaluation robustness study measures.
    pose_jitter: float = 0.0
    # Episode-synchronization groups (model/utils.py:81-87): group id per robot,
    # or None when episodes are per-robot independent.
    group_id: np.ndarray | None = None

    @property
    def n_segments(self) -> int:
        return int(self.seg_p.shape[0])


# ---------------------------------------------------------------------------
# Scenario tables
# ---------------------------------------------------------------------------


def circle_tables(n: int = 50, radius: float = 25.0):
    """50-robot circle-swap scenario (model/utils.py:6-38).

    The reference hardcodes coordinates rounded to 2 decimals; generating
    analytically and rounding reproduces those tables bit-for-bit.
    """
    k = np.arange(n)
    ang = k * (2.0 * np.pi / n)
    x = np.round(radius * np.cos(ang), 2)
    y = np.round(radius * np.sin(ang), 2)
    theta = np.pi * (n / 2.0 + k) / (n / 2.0)  # pi + 2*pi*k/n, facing center
    poses = np.stack([x, y, theta], axis=-1).astype(np.float32)
    goals = np.stack([-x, -y], axis=-1).astype(np.float32)
    return poses, goals


def stage2_tables():
    """44-robot structured scenario (model/utils.py:41-63).

    Robots 0-33 have fixed start poses and goals (six groups: two door swaps,
    two corridor files, a crossing, and a 10-robot circle); 34-43 spawn in the
    south-east corridor at random.  Coordinate data reproduced from the
    reference tables (it is scenario *data*, not code).
    """
    pi = np.pi
    poses = np.array(
        [
            [-7.00, 11.50, pi], [-7.00, 9.50, pi], [-18.00, 11.50, 0.0],
            [-18.00, 9.50, 0.0], [-12.50, 17.00, pi * 3 / 2], [-12.50, 4.00, pi / 2],
            [-2.00, 16.00, -pi / 2], [0.00, 16.00, -pi / 2], [3.00, 16.00, -pi / 2],
            [5.00, 16.00, -pi / 2], [10.00, 4.00, pi / 2], [12.00, 4.00, pi / 2],
            [14.00, 4.00, pi / 2], [16.00, 4.00, pi / 2], [18.00, 4.00, pi / 2],
            [-2.5, -2.5, 0.0], [-0.5, -2.5, 0.0], [3.5, -2.5, pi], [5.5, -2.5, pi],
            [-2.5, -18.5, pi / 2], [-0.5, -18.5, pi / 2], [1.5, -18.5, pi / 2],
            [3.5, -18.5, pi / 2], [5.5, -18.5, pi / 2],
            [-6.00, -10.00, pi], [-7.15, -6.47, pi * 6 / 5], [-10.15, -4.29, pi * 7 / 5],
            [-13.85, -4.29, pi * 8 / 5], [-16.85, -6.47, pi * 9 / 5],
            [-18.00, -10.00, pi * 2], [-16.85, -13.53, pi * 11 / 5],
            [-13.85, -15.71, pi * 12 / 5], [-10.15, -15.71, pi * 13 / 5],
            [-7.15, -13.53, pi * 14 / 5],
            [10.00, -17.00, pi / 2], [12.00, -17.00, pi / 2], [14.00, -17.00, pi / 2],
            [16.00, -17.00, pi / 2], [18.00, -17.00, pi / 2],
            [10.00, -2.00, -pi / 2], [12.00, -2.00, -pi / 2], [14.00, -2.00, -pi / 2],
            [16.00, -2.00, -pi / 2], [18.00, -2.00, -pi / 2],
        ],
        dtype=np.float32,
    )
    goals = np.zeros((44, 2), dtype=np.float32)
    goals[:34] = np.array(
        [
            [-18.0, 11.5], [-18.0, 9.5], [-7.0, 11.5], [-7.0, 9.5],
            [-12.5, 4.0], [-12.5, 17.0],
            [-2.0, 3.0], [0.0, 3.0], [3.0, 3.0], [5.0, 3.0],
            [10.0, 10.0], [12.0, 10.0], [14.0, 10.0], [16.0, 10.0], [18.0, 10.0],
            [3.5, -2.5], [5.5, -2.5], [-2.5, -2.5], [-0.5, -2.5],
            [-2.5, -5.5], [-0.5, -5.5], [1.5, -5.5], [3.5, -5.5], [5.5, -5.5],
            [-18.0, -10.0], [-16.85, -13.53], [-13.85, -15.71], [-10.15, -15.71],
            [-7.15, -13.53], [-6.00, -10.00], [-7.15, -6.47], [-10.15, -4.29],
            [-13.85, -4.29], [-16.85, -6.47],
        ],
        dtype=np.float32,
    )
    # Group boundaries [0, 6, 10, 15, 19, 24, 34, 44] (model/utils.py:83)
    bounds = [0, 6, 10, 15, 19, 24, 34, 44]
    group_id = np.zeros(44, dtype=np.int32)
    for g in range(len(bounds) - 1):
        group_id[bounds[g]:bounds[g + 1]] = g
    return poses, goals, group_id


# ---------------------------------------------------------------------------
# World builders
# ---------------------------------------------------------------------------

# Stage ray-trace resolution; geometry granularity of the reference simulator
# (worlds/stage1.world:3 `resolution 0.2`).
_STAGE_RESOLUTION = 0.2


def _bitmap_world_segments(png: str, size_m: float,
                           resolution: float = _STAGE_RESOLUTION,
                           simplify_tol: float | None = None,
                           reach_seeds=None):
    """Compile a bitmap world to segments.

    ``reach_seeds``: world points known reachable by robots; geometry outside
    their free component is filled solid (exact — it can never be seen or
    touched), which also subsumes the floorplan ``boundary 1`` border walls.
    ``simplify_tol`` defaults to the raster resolution: Stage itself
    quantizes world geometry to ``resolution``-sized raster cells
    (worlds/stage1.world:3), so chords within one cell of the raster contour
    stay inside the reference's own geometric granularity while cutting the
    segment count (stage1 rink: 154 -> 27) and with it the lidar kernel's
    per-robot candidate load (cell-table K: 48 -> 16, mean 34 -> 7).
    """
    if simplify_tol is None:
        simplify_tol = resolution
    path = os.path.join(_ASSETS, png)
    segs = segments_from_bitmap(path, (size_m, size_m), resolution,
                                simplify_tol, reach_seeds)
    if reach_seeds is None:
        segs += boundary_segments(size_m, size_m)  # floorplan `boundary 1`
    return segs


def _stage2_obstacle_segments():
    """The nine polygon obstacles of worlds/stage2.world:168-296.

    Stage normalizes block points to their bounding box and scales them into
    the model `size` (0.7 x 0.7 m) centered at `pose`.
    """
    obstacles = [
        ((12, -9), [(0, 0), (0, 1), (0.75, 1), (1, 0.75), (1, 0.25), (0.75, 0)]),
        ((16, -7), [(0.225, 0.0), (0.208, 0.086), (0.159, 0.159), (0.086, 0.208),
                    (0.0, 0.225), (-0.086, 0.208), (-0.159, 0.159), (-0.208, 0.086),
                    (-0.225, 0.0), (-0.208, -0.086), (-0.159, -0.159), (-0.086, -0.208),
                    (-0.0, -0.225), (0.086, -0.208), (0.159, -0.159), (0.208, -0.086)]),
        ((17, -9), [(-0.02, -0.077), (0.078, -0.077), (0.078, 0.077), (-0.02, 0.077)]),
        ((14, -11), [(-3, -1.5), (-3, 0.5), (-2, 1.5), (2, 1.5), (3, 0.5), (3, -1.5)]),
        ((10, -10), [(-3, -1.5), (-3, 0.5), (-2, 1.5), (2, 0.7), (3, 0.5), (3, 0)]),
        ((13, -7), [(0, -1.5), (0, 0.5), (0.5, -0.5), (1, 0.4), (2, -0.5), (0.5, -1)]),
        ((10, -7), [(0, 0), (0.3, 0.5), (0, 1), (0.4, 0.7), (0.5, 0)]),
        ((18, -11), [(-3, -1.5), (-3, 0.5), (-2, 1.5), (2, 0.7), (3, 0.5), (3, 0)]),
        ((15, -9), [(0, -1.5), (0, 0.5), (0.5, -0.5), (1, 0.4), (2, -0.5), (0.5, -1)]),
    ]
    segs = []
    for pose, pts in obstacles:
        segs += polygon_segments(pts, size=(0.7, 0.7), center=pose)
    return segs


@lru_cache(maxsize=None)
def stage1() -> WorldSpec:
    """24 robots, 20x20 m rounded rink, random poses/goals (worlds/stage1.world)."""
    seg_p, seg_e, valid = pack_segments(
        _bitmap_world_segments("rink.png", 20.0, reach_seeds=[(0.0, 0.0)]))
    return WorldSpec(
        name="stage1",
        n_robots=24,
        seg_p=seg_p,
        seg_e=seg_e,
        seg_valid=valid,
        timeout=150,
        omega_thresh=1.05,
        reset_mode=ResetMode.RANDOM_DISC,
        spawn_radius=9.0,
        goal_dist_min=8.0,
        goal_dist_max=10.0,
        dist_prev_zero_on_reset=False,
    )


@lru_cache(maxsize=None)
def stage2() -> WorldSpec:
    """44 robots, 40x40 m multi-room map + polygon obstacles (worlds/stage2.world)."""
    poses, goals, group_id = stage2_tables()
    seeds = [tuple(p[:2]) for p in poses] + [tuple(g) for g in goals[:34]]
    seeds += [(14.0, -3.0), (14.0, -16.0)]  # corridor spawn band
    segs = (_bitmap_world_segments("testenv.png", 40.0, reach_seeds=seeds)
            + _stage2_obstacle_segments())
    seg_p, seg_e, valid = pack_segments(segs)
    return WorldSpec(
        name="stage2",
        n_robots=44,
        seg_p=seg_p,
        seg_e=seg_e,
        seg_valid=valid,
        timeout=200,
        omega_thresh=1.05,
        reset_mode=ResetMode.TABLES_THEN_CORRIDOR,
        init_pose_table=poses,
        goal_table=goals,
        n_fixed=34,
        group_id=group_id,
        dist_prev_zero_on_reset=True,
    )


@lru_cache(maxsize=None)
def circle(n_robots: int = 50) -> WorldSpec:
    """50-robot circle swap in a 60x60 m rink (worlds/circle.world)."""
    seg_p, seg_e, valid = pack_segments(
        _bitmap_world_segments("rink.png", 60.0, reach_seeds=[(0.0, 0.0)]))
    poses, goals = circle_tables(n_robots)
    return WorldSpec(
        name="circle",
        n_robots=n_robots,
        seg_p=seg_p,
        seg_e=seg_e,
        seg_valid=valid,
        timeout=10000,
        omega_thresh=0.7,  # circle_world.py:195
        reset_mode=ResetMode.FIXED_TABLES,
        init_pose_table=poses,
        goal_table=goals,
        n_fixed=n_robots,
        dist_prev_zero_on_reset=True,
    )


@lru_cache(maxsize=None)
def circle_train(n_robots: int = 50, pose_jitter: float = 0.6,
                 timeout: int = 700) -> WorldSpec:
    """Trainable variant of the 50-robot circle swap (stage-3 fine-tuning).

    The reference never trains on its flagship eval scenario — it ships one
    hand-picked stage-2 checkpoint (``circle_test.py:109``).  The batched
    engine makes training directly on the (jittered) eval task cheap: same
    geometry and tables as :func:`circle`, but episodes auto-reset as ONE
    synchronized group (all 50 robots done -> fresh jittered ring, the
    stage-2 group mechanism with a single group), initial x/y perturbed by
    uniform ``+-pose_jitter`` per reset, and a finite timeout (the 50 m
    crossing takes ~500 steps at v_max * dt).  ``omega_thresh`` 0.7 matches
    the eval reward (``circle_world.py:195``).  ``dist_prev_zero_on_reset``
    is False — this world is ours, and the reference's reset quirk would
    inject a -125 first-step reward at 50 m goal distance.
    """
    seg_p, seg_e, valid = pack_segments(
        _bitmap_world_segments("rink.png", 60.0, reach_seeds=[(0.0, 0.0)]))
    poses, goals = circle_tables(n_robots)
    return WorldSpec(
        name="circle_train",
        n_robots=n_robots,
        seg_p=seg_p,
        seg_e=seg_e,
        seg_valid=valid,
        timeout=timeout,
        omega_thresh=0.7,
        reset_mode=ResetMode.TABLES_THEN_CORRIDOR,
        init_pose_table=poses,
        goal_table=goals,
        n_fixed=n_robots,
        group_id=np.zeros(n_robots, dtype=np.int32),
        pose_jitter=pose_jitter,
        dist_prev_zero_on_reset=False,
    )


@lru_cache(maxsize=None)
def mini(n_robots: int = 4, n_beams: int = 64) -> WorldSpec:
    """Small square room for fast tests/examples: stage-1 semantics at a
    fraction of the compute (few segments, few beams, few robots)."""
    seg_p, seg_e, valid = pack_segments(boundary_segments(20.0, 20.0))
    return WorldSpec(
        name="mini",
        n_robots=n_robots,
        n_beams=n_beams,
        seg_p=seg_p,
        seg_e=seg_e,
        seg_valid=valid,
        timeout=150,
        reset_mode=ResetMode.RANDOM_DISC,
        spawn_radius=9.0,
        goal_dist_min=8.0,
        goal_dist_max=10.0,
    )


def stage1_rect() -> WorldSpec:
    """Stage 1 under the FULL Stage footprint: the 0.44 x 0.38 m oriented
    box (`worlds/stage1.world:83`) for both collision and lidar
    silhouettes, instead of the disc approximation.  Same geometry,
    scenario, and reward as :func:`stage1`."""
    import dataclasses

    return dataclasses.replace(stage1(), name="stage1_rect",
                               footprint="rect")


def get_world(name: str) -> WorldSpec:
    return {"stage1": stage1, "stage2": stage2, "circle": circle,
            "circle_train": circle_train, "mini": mini,
            "stage1_rect": stage1_rect}[name]()
