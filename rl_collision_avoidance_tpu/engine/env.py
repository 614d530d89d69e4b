"""The fused collision-avoidance environment: A arenas x N robots per step.

This module is the TPU-native equivalent of the reference's entire L1+L2
stack: the Stage simulator process (``stageros.cpp``), the per-robot ROS env
clients (``stage_world1.py``/``stage_world2.py``/``circle_world.py``), and the
per-step gather/scatter topology of the MPI loop (``ppo_stage1.py:65-119``).
Publish/subscribe becomes returning arrays; the nondeterministic wall-clock
coupling of the reference (one RL step spans a variable number of 10 Hz sim
updates, ``stageros.cpp:819``) becomes an exact, reproducible
``substeps x dt`` integration.

The public API is *natively batched over arenas* (leading axis A) — the lidar
kernel packs multiple arenas into each grid program, which an outer ``vmap``
would hide.  ``reset1``/``step1`` are single-arena conveniences.  Shard the
arena axis over a device mesh for multi-chip/multi-host runs.

Step semantics (matching the reference step-for-step):
  1. dead robots (stage-2 ``liveflag``, ``ppo_stage2.py:72-84``) act as
     (v, w) = 0; live robots apply the clipped action;
  2. diff-drive integration with stall-on-collision (physics.py);
  3. reward & termination exactly as ``stage_world1.py:180-211`` and the
     stage-2/circle variants (goal +15, crash -15, progress *2.5, spin
     penalty, timeout);
  4. episode resets *inside* the step: per-robot immediately (stage 1),
     per-scenario-group (stage 2, ``model/utils.py:81-87``), or never
     (circle eval) — replacing ``reset_pose``/``generate_goal_point``;
  5. a single lidar pass at the post-reset poses serves both continuing
     robots (newest history frame) and freshly reset robots (history filled
     with the first scan 3x, like the initial ``deque([obs]*3)`` at
     ``ppo_stage1.py:60``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..worlds.spec import ResetMode, WorldSpec
from . import lidar, physics, sampling

# Action bounds [[v_min, w_min], [v_max, w_max]] (ppo_stage1.py:170).
V_MIN, V_MAX = 0.0, 1.0
W_MIN, W_MAX = -1.0, 1.0

_CELL_TABLE_CACHE: dict = {}


def _cell_table_for(spec: WorldSpec, pad_multiple: int = 8):
    """Build (once per world per process) the static culling table."""
    key = (spec.name, spec.n_segments, spec.max_range, pad_multiple)
    if key not in _CELL_TABLE_CACHE:
        from .celltable import build_cell_table

        _CELL_TABLE_CACHE[key] = build_cell_table(
            spec.seg_p, spec.seg_e, spec.seg_valid, spec.max_range, cell=1.0,
            pad_multiple=pad_multiple)
    return _CELL_TABLE_CACHE[key]


RESULT_RUNNING = 0
RESULT_GOAL = 1
RESULT_CRASH = 2
RESULT_TIMEOUT = 3


@struct.dataclass
class EnvState:
    pose: jnp.ndarray       # (A, N, 3) x, y, theta
    speed: jnp.ndarray      # (A, N, 2) applied (v, w)
    goal: jnp.ndarray       # (A, N, 2)
    dist: jnp.ndarray       # (A, N) distance to goal (the next step's "pre")
    step: jnp.ndarray       # (A, N) int32 in-episode step counter
    dead: jnp.ndarray       # (A, N) bool terminal-but-not-reset (stage2/circle)
    scan_hist: jnp.ndarray  # (A, N, F, B) normalized lidar frames, newest last
    ep_return: jnp.ndarray  # (A, N) running episode reward
    key: jnp.ndarray        # (A, 2) per-arena PRNG keys


@struct.dataclass
class Obs:
    scans: jnp.ndarray  # (A, N, F, B)
    goal: jnp.ndarray   # (A, N, 2) goal in the robot body frame
    speed: jnp.ndarray  # (A, N, 2)


@struct.dataclass
class StepInfo:
    result: jnp.ndarray      # (A, N) int32 result code for this step
    valid: jnp.ndarray       # (A, N) bool: transition usable for training
    ep_return: jnp.ndarray   # (A, N) episode return, emitted when done fires
    reached: jnp.ndarray     # (A, N) bool reached-goal event this step
    crashed: jnp.ndarray     # (A, N) bool crash event this step


class Env:
    """Pure-functional batched env for one :class:`WorldSpec`.

    ``use_pallas`` selects the fused VMEM lidar kernel (ops/lidar_pallas.py)
    with static cell-table culling; the default picks it on TPU backends and
    falls back to the dense XLA formulation elsewhere (bit-comparable, see
    tests/test_pallas.py).
    """

    def __init__(self, spec: WorldSpec, use_pallas: bool | None = None,
                 lidar_mode: str | None = None,
                 disc_cull_k: int | None = None,
                 rect_silhouette: bool | None = None,
                 obs_dtype=None):
        """``disc_cull_k``: opt-in APPROXIMATE robot-silhouette culling
        (test each robot's beams against only its k nearest neighbors;
        exact while at most k robots are in sensor range) — see
        lidar.raycast_culled.  Applies to disc silhouettes and, with
        ``footprint="rect"``, to the oriented-box silhouettes
        (lidar.raycast_boxes_culled) — the box path is dense O(N^2 B)
        otherwise and needs this beyond eval scale.  The default (None) is
        the exact parity configuration.

        ``rect_silhouette``: raytrace other robots as their oriented
        0.44 x 0.38 m rectangles (Stage's exact behavior) instead of discs.
        Defaults to True for ``footprint="rect"`` worlds — so "rect" gives
        full Stage fidelity in both collision AND lidar — and False for the
        disc worlds.  Requires the xla/dense lidar backends (the Pallas
        kernel models disc silhouettes).

        ``obs_dtype``: storage dtype of the stacked lidar history
        (``scan_hist``, the largest state/obs tensor: A x N x 3 x B).  None
        = f32 (exact parity).  OPT-IN ``jnp.bfloat16`` halves its HBM
        traffic — the large-arena acting bottleneck (docs/PERF.md round 4);
        the quantization error on the normalized ranges (~2^-9 relative,
        ~1-2 mm at 6 m) is far inside Stage's own 0.2 m raster fidelity.
        Lidar math itself stays f32; only storage quantizes."""
        self.spec = spec
        self.obs_dtype = obs_dtype
        self.disc_cull_k = disc_cull_k
        if rect_silhouette is None:
            rect_silhouette = spec.footprint == "rect"
        self.rect_silhouette = bool(rect_silhouette)
        self._rect_dims = ((spec.rect_half_len, spec.rect_half_wid)
                           if self.rect_silhouette else None)
        self.n_robots = spec.n_robots
        self.n_beams = spec.n_beams
        self.obs_beams = spec.obs_beams or spec.n_beams
        self._obs_idx = (None if self.obs_beams == spec.n_beams else
                         lidar.sparse_beam_index(spec.n_beams, self.obs_beams))
        self.frames = spec.laser_frames
        platform = jax.devices()[0].platform
        # Lidar backends, all bit-comparable (tests/test_pallas.py):
        #   "xla"    — cell-table culling + fused XLA pair test (default:
        #              no custom call, so no per-call dispatch cost);
        #   "pallas" — VMEM Pallas kernel over the same culled segments
        #              (wins once per-step compute dwarfs the ~0.4 ms fixed
        #              custom-call dispatch of the axon runtime);
        #   "dense"  — reference formulation against all segments (CPU/tests).
        if lidar_mode is None:
            if use_pallas is None:
                lidar_mode = "xla" if platform != "cpu" else "dense"
            else:
                lidar_mode = "pallas" if use_pallas else "dense"
        assert lidar_mode in ("xla", "pallas", "dense"), lidar_mode
        if self.rect_silhouette and lidar_mode == "pallas":
            raise ValueError(
                "rect_silhouette needs lidar_mode='xla' or 'dense' "
                "(the Pallas kernel models disc silhouettes)")
        self.lidar_mode = lidar_mode
        self.use_pallas = lidar_mode == "pallas"
        # World constants are kept as NUMPY arrays on purpose: numpy captures
        # are baked into the executable as literals, whereas closing over a
        # jnp (device) array — of ANY size — permanently degrades dispatch on
        # the axon TPU runtime to ~0.4 ms per loop iteration (measured; see
        # docs/PERF.md "dispatch poisoning").  Never store jnp arrays on self.
        if lidar_mode != "dense":
            from .celltable import build_cell_table, lookup_cells

            # Pallas wants the K axis sublane-aligned (multiple of 8); the
            # fused XLA path keeps K as an outer loop dim where padding is
            # pure wasted pair tests — use the tightest even K there.
            ct = _cell_table_for(spec, pad_multiple=8 if lidar_mode == "pallas"
                                 else 2)
            self._cell_table_meta = ct
            self._cell_table = np.asarray(ct.table)
            self._lookup_cells = lookup_cells
            # Separate table for wall-collision: candidates only need to be
            # within the footprint's circumradius (not max_range), so K
            # drops from ~16 to ~4.
            reach = spec.robot_radius
            if spec.footprint == "rect":
                reach = max(reach, float(np.hypot(spec.rect_half_len,
                                                  spec.rect_half_wid)))
            ctw = build_cell_table(spec.seg_p, spec.seg_e, spec.seg_valid,
                                   reach, cell=1.0, pad_multiple=2)
            self._wall_table_meta = ctw
            self._wall_table = np.asarray(ctw.table)
        if lidar_mode == "pallas":
            from ..ops.lidar_pallas import make_scan_fn

            self._pallas_scan = make_scan_fn(
                spec.n_beams, spec.fov, spec.robot_radius, spec.max_range,
                interpret=(platform == "cpu"))
        self._local_dirs = np.asarray(
            lidar.beam_directions_local(spec.n_beams, spec.fov))
        self._seg_p = np.asarray(spec.seg_p)
        self._seg_e = np.asarray(spec.seg_e)
        self._seg_valid = np.asarray(spec.seg_valid)
        if spec.init_pose_table is not None:
            self._pose_table = np.asarray(spec.init_pose_table)
            self._goal_table = np.asarray(spec.goal_table)
        else:
            self._pose_table = None
            self._goal_table = None
        if spec.group_id is not None:
            gid = np.asarray(spec.group_id)
            self._group_id = gid
            n_groups = int(gid.max()) + 1
            self._group_member = np.asarray(
                gid[None, :] == np.arange(n_groups)[:, None])  # (G, N)
        else:
            self._group_id = None
            self._group_member = None

    # ------------------------------------------------------------------
    # observation helpers
    # ------------------------------------------------------------------

    def _culled_for(self, pos):
        """(A, N, 2) -> (A, N, K, 4) candidate segments via the cell table."""
        a, n, _ = pos.shape
        cells = self._lookup_cells(self._cell_table_meta, pos.reshape(a * n, 2))
        culled = jnp.take(self._cell_table, cells, axis=0)  # (A*N, K, 4)
        return culled.reshape(a, n, -1, 4)

    def _raw_scan(self, pose):
        """(A, N, 3) poses -> (A, N, B) ranges."""
        if self.lidar_mode == "xla":
            return lidar.raycast_culled(
                pose, self._local_dirs, self._culled_for(pose[..., :2]),
                self.spec.robot_radius, self.spec.max_range,
                disc_k=self.disc_cull_k, rect=self._rect_dims)
        if self.lidar_mode == "pallas":
            culled = jnp.swapaxes(self._culled_for(pose[..., :2]), 1, 2)
            return self._pallas_scan(pose, culled)
        per_arena = lambda p: lidar.scan(
            p, self._local_dirs, self._seg_p, self._seg_e, self._seg_valid,
            self.spec.robot_radius, self.spec.max_range,
            rect=self._rect_dims)
        return jax.vmap(per_arena)(pose)

    def _scan_obs(self, pose):
        """Normalized lidar frame: ranges/6 - 0.5, after the optional sparse
        left/right resample (stage_world1.py:122-140)."""
        scan = self._raw_scan(pose)
        if self._obs_idx is not None:
            scan = scan[..., self._obs_idx]
        scan = scan / self.spec.max_range - 0.5
        if self.obs_dtype is not None:
            scan = scan.astype(self.obs_dtype)
        return scan

    @staticmethod
    def _local_goal(pose, goal):
        """Goal in the body frame (stage_world1.py:155-160)."""
        dx = goal[..., 0] - pose[..., 0]
        dy = goal[..., 1] - pose[..., 1]
        c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
        return jnp.stack([dx * c + dy * s, -dx * s + dy * c], axis=-1)

    def _obs(self, state: EnvState) -> Obs:
        return Obs(scans=state.scan_hist,
                   goal=self._local_goal(state.pose, state.goal),
                   speed=state.speed)

    # ------------------------------------------------------------------
    # resets
    # ------------------------------------------------------------------

    def _sample_pose_goal_1(self, key, cur_pose):
        """Fresh (pose, goal) for every robot of ONE arena (applied under a
        mask).  cur_pose: (N, 3) — the stage-2 corridor sampler's >= 7 m
        constraint is relative to the robot's current position."""
        spec = self.spec
        n = self.n_robots
        kp, kg, kj = jax.random.split(key, 3)
        if spec.reset_mode is ResetMode.RANDOM_DISC:
            pose = sampling.stage1_poses(kp, n, spec.spawn_radius)
            goal = sampling.stage1_goals(kg, pose[:, :2], spec.spawn_radius,
                                         spec.goal_dist_min,
                                         spec.goal_dist_max)
            return pose, goal
        # Table poses, optionally jittered (circle_train: uniform +-J on x/y
        # per reset; goals and headings stay exact, matching the eval
        # robustness study in eval/circle.py).
        table_pose = jnp.asarray(self._pose_table)
        if spec.pose_jitter > 0.0:
            noise = jax.random.uniform(kj, (n, 2), minval=-spec.pose_jitter,
                                       maxval=spec.pose_jitter)
            table_pose = table_pose.at[:, :2].add(noise)
        if spec.reset_mode is ResetMode.TABLES_THEN_CORRIDOR:
            rpose = sampling.corridor_poses(kp, cur_pose[:, :2])
            rgoal = sampling.corridor_goals(kg, rpose[:, :2])
            fixed = jnp.arange(n) < spec.n_fixed
            pose = jnp.where(fixed[:, None], table_pose, rpose)
            goal = jnp.where(fixed[:, None], self._goal_table, rgoal)
            return pose, goal
        # FIXED_TABLES
        return table_pose, jnp.asarray(self._goal_table)

    def _sample_pose_goal(self, keys, cur_pose):
        """Batched over arenas: keys (A, 2), cur_pose (A, N, 3)."""
        return jax.vmap(self._sample_pose_goal_1)(keys, cur_pose)

    def _reset_dist(self, pose, goal):
        """Initial "previous distance": true distance (stage 1,
        stage_world1.py:171-177) or 0 (stage 2/circle, stage_world2.py:170)."""
        if self.spec.dist_prev_zero_on_reset:
            return jnp.zeros(pose.shape[:-1])
        return jnp.linalg.norm(goal - pose[..., :2], axis=-1)

    def reset(self, keys) -> tuple[EnvState, Obs]:
        """Fresh arenas; keys: (A,) PRNG keys (one per arena)."""
        a = keys.shape[0]
        n = self.n_robots
        split = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        key, k_samp = split[:, 0], split[:, 1]
        pose, goal = self._sample_pose_goal(k_samp, jnp.zeros((a, n, 3)))
        state = EnvState(
            pose=pose,
            speed=jnp.zeros((a, n, 2)),
            goal=goal,
            dist=self._reset_dist(pose, goal),
            step=jnp.zeros((a, n), jnp.int32),
            dead=jnp.zeros((a, n), bool),
            scan_hist=jnp.zeros((a, n, self.frames, self.obs_beams),
                                self.obs_dtype or jnp.float32),
            ep_return=jnp.zeros((a, n)),
            key=key,
        )
        first = self._scan_obs(pose)
        state = state.replace(
            scan_hist=jnp.repeat(first[:, :, None, :], self.frames, axis=2))
        return state, self._obs(state)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------

    def step(self, state: EnvState, action: jnp.ndarray
             ) -> tuple[EnvState, Obs, jnp.ndarray, jnp.ndarray, StepInfo]:
        """One control step for all robots of all arenas.

        action: (A, N, 2) raw policy samples; clipped here exactly like
        ``model/ppo.py:75`` before execution.
        Returns (state', obs', reward, done, info); ``done`` mirrors the
        reference's gathered ``terminal_list`` (latched True while a stage-2
        robot is dead).
        """
        spec = self.spec
        split = jax.vmap(lambda k: jax.random.split(k, 2))(state.key)
        key, k_reset = split[:, 0], split[:, 1]

        live = ~state.dead
        v = jnp.clip(action[..., 0], V_MIN, V_MAX) * live
        if spec.reset_mode is ResetMode.FIXED_TABLES:
            # Finished circle-eval robots keep steering with the policy's w
            # but v := 0 (circle_test.py:64-66) — they spin in place and stay
            # in the arena as obstacles.
            w = jnp.clip(action[..., 1], W_MIN, W_MAX)
        else:
            w = jnp.clip(action[..., 1], W_MIN, W_MAX) * live

        cand = physics.integrate(state.pose, v, w, spec.dt, spec.substeps)
        rect = spec.footprint == "rect"
        if self.lidar_mode != "dense":
            a, n = cand.shape[:2]
            cells = self._lookup_cells(self._wall_table_meta,
                                       cand[..., :2].reshape(a * n, 2))
            culled_w = jnp.take(self._wall_table, cells,
                                axis=0).reshape(a, n, -1, 4)
            if rect:
                wall = physics.rect_wall_collision(
                    cand, culled_w, spec.rect_half_len, spec.rect_half_wid)
            else:
                wall = physics.wall_collision_packed(
                    cand[..., :2], culled_w, spec.robot_radius)
        elif rect:
            degen = np.asarray([1e7, 1e7, 0.0, 0.0], np.float32)
            packed = np.where(self._seg_valid[:, None],
                              np.concatenate([self._seg_p, self._seg_e], -1),
                              degen)
            full = jnp.broadcast_to(jnp.asarray(packed),
                                    cand.shape[:2] + packed.shape)
            wall = physics.rect_wall_collision(
                cand, full, spec.rect_half_len, spec.rect_half_wid)
        else:
            wall = jax.vmap(lambda p: physics.wall_collision(
                p, self._seg_p, self._seg_e, self._seg_valid,
                spec.robot_radius))(cand[..., :2])
        if rect:
            stalled = wall | physics.rect_robot_collision(
                cand, spec.rect_half_len, spec.rect_half_wid)
        else:
            stalled = wall | physics.robot_collision(cand[..., :2],
                                                     spec.robot_radius)
        pose = jnp.where(stalled[..., None], state.pose, cand)

        t = state.step + live.astype(jnp.int32)
        dist_new = jnp.linalg.norm(state.goal - pose[..., :2], axis=-1)

        # Reward (stage_world1.py:180-211); same formula for all workloads,
        # parameterized by omega_thresh / timeout.
        reached = dist_new < spec.goal_size
        crashed = stalled
        timeout = t > spec.timeout
        reward_g = jnp.where(reached, 15.0, (state.dist - dist_new) * 2.5)
        reward_c = jnp.where(crashed, -15.0, 0.0)
        # The spin penalty reads the *realized* angular velocity: the
        # reference uses the ground-truth twist, finite-differenced from
        # poses (stage_world1.py:183, stageros.cpp:579-593), so a stalled
        # robot (pose reverted) shows w = 0 and is not penalized.
        w_real = w * ~stalled
        reward_w = jnp.where(jnp.abs(w_real) > spec.omega_thresh,
                             -0.1 * jnp.abs(w_real), 0.0)
        reward = (reward_g + reward_c + reward_w) * live

        terminal = (reached | crashed | timeout) & live
        result = jnp.where(
            timeout, RESULT_TIMEOUT,
            jnp.where(crashed, RESULT_CRASH,
                      jnp.where(reached, RESULT_GOAL, RESULT_RUNNING)))
        result = jnp.where(live, result, RESULT_RUNNING)

        dead_after = state.dead | terminal
        if spec.reset_mode is ResetMode.RANDOM_DISC:
            reset_mask = terminal
            dead_next = jnp.zeros_like(dead_after)
        elif spec.reset_mode is ResetMode.TABLES_THEN_CORRIDOR:
            # Group-synchronized episode boundaries (model/utils.py:81-87).
            group_done = jnp.all(
                dead_after[:, None, :] | ~self._group_member[None], axis=-1)
            reset_mask = group_done[:, self._group_id]           # (A, N)
            dead_next = dead_after & ~reset_mask
        else:  # FIXED_TABLES: eval, never reset
            reset_mask = jnp.zeros_like(dead_after)
            dead_next = dead_after

        new_pose, new_goal = self._sample_pose_goal(k_reset, pose)
        pose = jnp.where(reset_mask[..., None], new_pose, pose)
        goal = jnp.where(reset_mask[..., None], new_goal, state.goal)
        dist = jnp.where(reset_mask, self._reset_dist(pose, goal), dist_new)
        step_ctr = jnp.where(reset_mask, 0, t)
        # Speed obs mirrors the reference's odometry twist — Stage's velocity
        # STATE, i.e. the commanded (v, w) as applied this step (GetVelocity
        # at stageros.cpp:547; fed back via stage_world1.py:108,143).  Dead
        # stage-2 robots command (0, 0); finished circle robots command
        # (0, w); fresh resets start at rest.
        speed = jnp.where(reset_mask[..., None], 0.0,
                          jnp.stack([v, w], axis=-1))

        ep_return_now = state.ep_return + reward
        ep_return = jnp.where(reset_mask, 0.0, ep_return_now)

        # One lidar pass at post-reset poses (fresh robots fill history 3x).
        scan = self._scan_obs(pose)
        shifted = jnp.concatenate(
            [state.scan_hist[:, :, 1:], scan[:, :, None]], axis=2)
        filled = jnp.repeat(scan[:, :, None], self.frames, axis=2)
        scan_hist = jnp.where(reset_mask[..., None, None], filled, shifted)

        new_state = EnvState(pose=pose, speed=speed, goal=goal, dist=dist,
                             step=step_ctr, dead=dead_next,
                             scan_hist=scan_hist, ep_return=ep_return,
                             key=key)
        done = state.dead | terminal
        info = StepInfo(result=result, valid=live,
                        ep_return=jnp.where(terminal, ep_return_now, 0.0),
                        reached=reached & live, crashed=crashed & live)
        return new_state, self._obs(new_state), reward, done, info

    def teleport(self, state: EnvState, pose: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> EnvState:
        """Set robot poses directly — the ``control_pose`` / ``cmd_pose``
        equivalent (stage_world1.py:237-249, stageros.cpp:282-296).

        pose: (A, N, 3); mask: optional (A, N) bool selecting robots.
        Goal distance is re-derived so the next progress reward is computed
        from the new position; the lidar history refreshes on the next step.
        """
        if mask is not None:
            pose = jnp.where(mask[..., None], pose, state.pose)
        dist = jnp.linalg.norm(state.goal - pose[..., :2], axis=-1)
        return state.replace(pose=pose, dist=dist)

    # ------------------------------------------------------------------
    # single-arena conveniences (tests, simple scripts)
    # ------------------------------------------------------------------

    def reset1(self, key):
        """Single-arena reset: unbatched state/obs (tests, simple scripts)."""
        unb = partial(jax.tree_util.tree_map, lambda x: x[0])
        state, obs = self.reset(key[None])
        return unb(state), unb(obs)

    def step1(self, state, action):
        """Single-arena step over an unbatched state."""
        b = partial(jax.tree_util.tree_map, lambda x: x[None])
        unb = partial(jax.tree_util.tree_map, lambda x: x[0])
        out = self.step(b(state), action[None])
        return tuple(unb(o) for o in out)


def make_env(spec: WorldSpec, use_pallas: bool | None = None,
             lidar_mode: str | None = None) -> Env:
    return Env(spec, use_pallas=use_pallas, lidar_mode=lidar_mode)
