"""Env semantics: rewards, termination, auto-reset, stage-2 groups,
determinism.  Mirrors the reference behaviors of stage_world1.py:180-274,
ppo_stage2.py:72-106, model/utils.py:65-87."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_collision_avoidance_tpu.engine import make_env
from rl_collision_avoidance_tpu.engine.env import (RESULT_CRASH, RESULT_GOAL,
                                                   RESULT_TIMEOUT)
from rl_collision_avoidance_tpu.worlds import mini, stage2, circle


@pytest.fixture(scope="module")
def env():
    return make_env(mini())


@pytest.fixture(scope="module")
def jitted(env):
    return jax.jit(env.reset1), jax.jit(env.step1)


def test_reset_invariants(env, jitted):
    reset, _ = jitted
    state, obs = reset(jax.random.PRNGKey(1))
    pos = np.asarray(state.pose[:, :2])
    # spawn within the 9 m disc (stage_world1.py:251-260)
    assert (np.linalg.norm(pos, axis=-1) <= 9.0 + 1e-5).all()
    # goals 8-10 m from the start (stage_world1.py:262-274); rejection
    # sampling may rarely fall back, so allow tiny slack on count
    d = np.linalg.norm(np.asarray(state.goal) - pos, axis=-1)
    assert ((d >= 8.0 - 1e-5) & (d <= 10.0 + 1e-5)).mean() >= 0.75
    # initial dist = true distance (stage 1 semantics)
    np.testing.assert_allclose(np.asarray(state.dist), d, rtol=1e-5)
    # history filled with the same first frame
    s = np.asarray(obs.scans)
    np.testing.assert_allclose(s[:, 0], s[:, 1])
    np.testing.assert_allclose(s[:, 1], s[:, 2])
    assert np.asarray(state.step).sum() == 0


def test_progress_reward(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(2))
    # drive straight toward the local goal: set heading toward goal
    to_goal = np.asarray(state.goal) - np.asarray(state.pose[:, :2])
    theta = np.arctan2(to_goal[:, 1], to_goal[:, 0])
    state = state.replace(pose=state.pose.at[:, 2].set(jnp.asarray(theta)))
    d0 = np.asarray(state.dist).copy()
    act = jnp.tile(jnp.asarray([[1.0, 0.0]]), (env.n_robots, 1))
    state, obs, r, done, info = step(state, act)
    moved = ~np.asarray(info.crashed)
    # progress = 0.1 m * 2.5 = 0.25 per robot that moved freely
    np.testing.assert_allclose(np.asarray(r)[moved], 0.25, atol=1e-3)
    np.testing.assert_allclose(d0[moved] - np.asarray(state.dist)[moved],
                               0.1, atol=1e-4)


def test_goal_reward_and_reset(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(3))
    # teleport robot 0 just outside goal radius, aimed at the goal
    g = np.asarray(state.goal)[0]
    pose = np.array(state.pose)
    d = 0.55
    pose[0] = [g[0] - d, g[1], 0.0]
    state = state.replace(pose=jnp.asarray(pose),
                          dist=jnp.asarray(np.linalg.norm(
                              np.asarray(state.goal) - pose[:, :2], axis=-1)))
    act = jnp.zeros((env.n_robots, 2)).at[0, 0].set(1.0)
    state, obs, r, done, info = step(state, act)
    # moved 0.1 -> dist 0.45 < 0.5 -> +15, terminal, result GOAL
    assert float(r[0]) == pytest.approx(15.0)
    assert bool(done[0])
    assert int(info.result[0]) == RESULT_GOAL
    # auto-reset: robot 0 got a fresh episode (step counter cleared, goal
    # 8-10 m away in most draws)
    assert int(state.step[0]) == 0
    assert float(state.dist[0]) > 0.5


def test_crash_reward(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(4))
    pose = np.array(state.pose)
    pose[0] = [9.7, 0.0, 0.0]  # facing the x=+10 wall 0.3 m ahead... r=0.22
    state = state.replace(pose=jnp.asarray(pose),
                          dist=jnp.asarray(np.linalg.norm(
                              np.asarray(state.goal) - pose[:, :2], axis=-1)))
    act = jnp.zeros((env.n_robots, 2)).at[0, 0].set(1.0)
    state, obs, r, done, info = step(state, act)
    assert bool(info.crashed[0])
    assert int(info.result[0]) == RESULT_CRASH
    assert bool(done[0])
    # crash reward = -15 + progress(0 moved) + ... = -15 exactly (no motion)
    assert float(r[0]) == pytest.approx(-15.0, abs=1e-5)


def test_timeout(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(5))
    state = state.replace(step=jnp.full((env.n_robots,), 150, jnp.int32))
    act = jnp.zeros((env.n_robots, 2))
    state, obs, r, done, info = step(state, act)
    assert bool(np.asarray(done).all())
    assert (np.asarray(info.result) == RESULT_TIMEOUT).all()
    assert (np.asarray(state.step) == 0).all()  # all reset


def test_spin_penalty(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(6))
    act = jnp.tile(jnp.asarray([[0.0, 1.1]]), (env.n_robots, 1))
    state, obs, r, done, info = step(state, act)
    # |w| clipped to 1.0 < 1.05 threshold -> no penalty (bounds!)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)


def test_local_goal_frame(env, jitted):
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(7))
    pose = np.array(state.pose)
    goal = np.asarray(state.goal)
    lg = np.asarray(env._local_goal(jnp.asarray(pose), jnp.asarray(goal)))
    for i in range(env.n_robots):
        dx, dy = goal[i] - pose[i, :2]
        th = pose[i, 2]
        exp = [dx * np.cos(th) + dy * np.sin(th),
               -dx * np.sin(th) + dy * np.cos(th)]
        np.testing.assert_allclose(lg[i], exp, atol=1e-5)
    # distance is frame-invariant
    np.testing.assert_allclose(np.linalg.norm(lg, axis=-1),
                               np.linalg.norm(goal - pose[:, :2], axis=-1),
                               rtol=1e-5)


def test_determinism(env, jitted):
    reset, step = jitted
    act = jnp.tile(jnp.asarray([[0.7, 0.2]]), (env.n_robots, 1))
    outs = []
    for _ in range(2):
        state, obs = reset(jax.random.PRNGKey(42))
        for _ in range(10):
            state, obs, r, done, info = step(state, act)
        outs.append((np.asarray(state.pose), np.asarray(r)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])  # bit-exact
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


# ---------------------------------------------------------------------------
# stage 2: liveflag, groups, validity mask
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def env2():
    return make_env(stage2())


def test_stage2_reset_uses_tables(env2):
    state, obs = jax.jit(env2.reset1)(jax.random.PRNGKey(0))
    pose = np.array(state.pose)
    np.testing.assert_allclose(pose[0], [-7.0, 11.5, np.pi], atol=1e-5)
    np.testing.assert_allclose(pose[33, :2], [-7.15, -13.53], atol=1e-5)
    # corridor robots 34..43: x in [9,19], y in [-19,-13] u [-5,-1]
    xy = pose[34:, :2]
    assert ((xy[:, 0] >= 9) & (xy[:, 0] <= 19)).all()
    assert (((xy[:, 1] >= -5.0) & (xy[:, 1] <= -1.0))
            | ((xy[:, 1] >= -19.0) & (xy[:, 1] <= -13.0))).all()
    # stage-2 quirk: initial dist seeded with 0 (stage_world2.py:170)
    np.testing.assert_allclose(np.asarray(state.dist), 0.0)


def test_stage2_dead_robots_freeze_and_mask(env2):
    step = jax.jit(env2.step1)
    state, obs = jax.jit(env2.reset1)(jax.random.PRNGKey(1))
    # mark robot 6 dead (its group is 6..9)
    dead = np.zeros(44, bool)
    dead[6] = True
    state = state.replace(dead=jnp.asarray(dead))
    p0 = np.asarray(state.pose)[6]
    act = jnp.tile(jnp.asarray([[1.0, 0.5]]), (44, 1))
    state, obs, r, done, info = step(state, act)
    np.testing.assert_allclose(np.asarray(state.pose)[6], p0)  # frozen
    assert float(r[6]) == 0.0
    assert not bool(info.valid[6])          # masked transition
    assert bool(done[6])                    # latched terminal
    assert bool(np.asarray(info.valid)[:6].all())


def test_stage2_group_reset(env2):
    step = jax.jit(env2.step1)
    state, obs = jax.jit(env2.reset1)(jax.random.PRNGKey(2))
    # kill the whole group 1 (robots 6..9) except robot 6; then make robot 6
    # reach its goal -> whole group resets
    dead = np.zeros(44, bool)
    dead[7:10] = True
    pose = np.array(state.pose)
    goal = np.asarray(state.goal)
    pose[6] = [goal[6, 0] - 0.55, goal[6, 1], 0.0]
    state = state.replace(dead=jnp.asarray(dead), pose=jnp.asarray(pose))
    act = jnp.zeros((44, 2)).at[6, 0].set(1.0)
    state, obs, r, done, info = step(state, act)
    dead_after = np.asarray(state.dead)
    assert not dead_after[6:10].any()       # group reset, all alive again
    assert (np.asarray(state.step)[6:10] == 0).all()
    # the reset robots are back at their scenario poses
    np.testing.assert_allclose(np.asarray(state.pose)[7, :2],
                               [0.0, 16.0], atol=1e-5)


def test_circle_never_resets():
    envc = make_env(circle())
    step = jax.jit(envc.step1)
    state, obs = jax.jit(envc.reset1)(jax.random.PRNGKey(0))
    pose0 = np.asarray(state.pose)
    np.testing.assert_allclose(pose0[0, :2], [25.0, 0.0], atol=1e-5)
    dead = np.ones(50, bool)
    state = state.replace(dead=jnp.asarray(dead))
    state, obs, r, done, info = step(state, jnp.ones((50, 2)))
    assert bool(np.asarray(state.dead).all())   # still dead, no reset
    # Finished circle robots stop translating but KEEP STEERING with the
    # policy's w (circle_test.py:64-66 zeroes only action[0]).
    np.testing.assert_allclose(np.asarray(state.pose)[:, :2], pose0[:, :2])
    np.testing.assert_allclose(np.asarray(state.pose)[:, 2],
                               pose0[:, 2] + 1.0 * envc.spec.dt, rtol=1e-5)
    # and their speed obs mirrors the commanded twist (v=0, w)
    np.testing.assert_allclose(np.asarray(state.speed),
                               np.tile([0.0, 1.0], (50, 1)), atol=1e-6)


def test_stalled_robot_has_no_spin_penalty(env, jitted):
    """The reference's spin penalty reads the ground-truth (realized) angular
    velocity (stage_world1.py:183, finite-differenced poses at
    stageros.cpp:579-593): a stalled robot's pose is frozen, so w_GT = 0 and
    only the -15 crash reward applies."""
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(14))
    pose = np.array(state.pose)
    pose[0] = [9.9, 0.0, 0.0]  # 0.1 m from the x=+10 wall, radius 0.22
    state = state.replace(pose=jnp.asarray(pose),
                          dist=jnp.asarray(np.linalg.norm(
                              np.asarray(state.goal) - pose[:, :2], axis=-1)))
    act = jnp.zeros((env.n_robots, 2)).at[0].set(jnp.asarray([1.0, 1.0]))
    # w commanded 1.0 but clipped realized w = 0 on stall; threshold is 1.05
    # so use an unclipped-in-bounds w that would trip it if commanded were
    # used... bounds cap |w| at 1.0 < 1.05, so instead check via omega env
    state2, obs2, r, done, info = step(state, act)
    assert bool(info.crashed[0])
    assert float(r[0]) == pytest.approx(-15.0, abs=1e-5)


def test_circle_spin_penalty_uses_realized_w():
    """omega_thresh = 0.7 in the circle world (circle_world.py:195): a live
    spinning robot is penalized, a stalled one is not."""
    envc = make_env(circle())
    step = jax.jit(envc.step1)
    state, obs = jax.jit(envc.reset1)(jax.random.PRNGKey(1))
    act = jnp.tile(jnp.asarray([[0.0, 0.9]]), (50, 1))
    state2, obs2, r, done, info = step(state, act)
    live_free = ~np.asarray(info.crashed)
    # dist_prev_zero_on_reset means the first progress reward is -dist*2.5;
    # isolate the spin term by differencing against a no-spin step
    state3, obs3, r0, done0, info0 = step(state, act * 0.0)
    both_free = live_free & ~np.asarray(info0.crashed)
    np.testing.assert_allclose(np.asarray(r - r0)[both_free], -0.09,
                               atol=1e-3)


def test_teleport(env, jitted):
    """control_pose equivalence (cmdpose_tests.py:136-203): teleported robot
    reports exactly the commanded pose; goal distance re-derives."""
    reset, step = jitted
    state, obs = reset(jax.random.PRNGKey(8))
    target = np.array(state.pose)
    target[0] = [3.0, -2.0, 1.5]
    mask = np.zeros(env.n_robots, bool)
    mask[0] = True
    b = lambda x: jnp.asarray(x)[None]
    new = jax.tree_util.tree_map(
        lambda x: x[0],
        env.teleport(jax.tree_util.tree_map(lambda x: x[None], state),
                     b(target), b(mask)))
    np.testing.assert_allclose(np.asarray(new.pose)[0], [3.0, -2.0, 1.5])
    np.testing.assert_allclose(np.asarray(new.pose)[1:],
                               np.asarray(state.pose)[1:])
    want = np.linalg.norm(np.asarray(state.goal)[0] - [3.0, -2.0])
    np.testing.assert_allclose(float(new.dist[0]), want, rtol=1e-5)


def test_circle_train_jittered_group_reset():
    """circle_train resets: poses jittered within +-pose_jitter of the
    tables (per arena, per reset), goals/headings exact; the single group
    resets only when every robot is done."""
    import numpy as np

    from rl_collision_avoidance_tpu.engine.env import Env
    from rl_collision_avoidance_tpu.worlds import circle_train

    spec = circle_train()
    env = Env(spec)
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    state, obs = env.reset(keys)
    pose = np.asarray(state.pose)
    dev = pose[..., :2] - spec.init_pose_table[None, :, :2]
    assert np.abs(dev).max() <= spec.pose_jitter + 1e-6
    assert not np.allclose(pose[0], pose[1])  # arenas draw different jitter
    np.testing.assert_array_equal(np.asarray(state.pose[..., 2]),
                                  np.broadcast_to(
                                      spec.init_pose_table[None, :, 2],
                                      (2, spec.n_robots)))
    np.testing.assert_array_equal(
        np.asarray(state.goal),
        np.broadcast_to(spec.goal_table[None], (2, spec.n_robots, 2)))

    # Teleport all robots onto their goals -> everyone terminal -> the one
    # group resets the whole ring to fresh jittered poses.
    goal_pose = jnp.concatenate(
        [state.goal, state.pose[..., 2:]], axis=-1)
    state = env.teleport(state, goal_pose)
    state2, obs2, reward, done, info = env.step(
        state, jnp.zeros((2, spec.n_robots, 2)))
    assert bool(jnp.all(done))
    assert not bool(jnp.any(state2.dead))  # reset, not latched dead
    pose2 = np.asarray(state2.pose)
    dev2 = pose2[..., :2] - spec.init_pose_table[None, :, :2]
    assert np.abs(dev2).max() <= spec.pose_jitter + 1e-6
    assert not np.allclose(pose2, pose)  # fresh jitter draw

    # One robot still running -> no reset for anyone (group barrier).
    state3, _ = env.reset(keys)
    part = jnp.concatenate([state3.goal, state3.pose[..., 2:]], -1)
    part = part.at[:, 0, :2].set(state3.pose[:, 0, :2])  # robot 0 stays put
    state3 = env.teleport(state3, part)
    state4, _, _, done4, _ = env.step(
        state3, jnp.zeros((2, spec.n_robots, 2)))
    assert bool(jnp.all(state4.dead[:, 1:]))  # finished, latched, waiting
    assert not bool(jnp.any(state4.dead[:, 0]))


def test_env_obs_bf16_storage():
    """Opt-in Env(obs_dtype=bfloat16): scan history stores/emits bf16 and
    tracks the f32 scan within bf16 quantization; default stays f32."""
    import numpy as np

    from rl_collision_avoidance_tpu.engine.env import Env
    from rl_collision_avoidance_tpu.worlds import mini

    spec = mini()
    key = jax.random.PRNGKey(0)
    e32 = Env(spec)
    e16 = Env(spec, obs_dtype=jnp.bfloat16)
    s32, o32 = e32.reset(key[None])
    s16, o16 = e16.reset(key[None])
    assert o32.scans.dtype == jnp.float32
    assert o16.scans.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o32.scans),
                               np.asarray(o16.scans, np.float32), atol=4e-3)
    act = jnp.zeros((1, spec.n_robots, 2))
    _, o32b, r32, d32, _ = e32.step(s32, act)
    _, o16b, r16, d16, _ = e16.step(s16, act)
    assert o16b.scans.dtype == jnp.bfloat16
    # rewards/termination are computed from f32 state, unaffected
    np.testing.assert_allclose(np.asarray(r32), np.asarray(r16), atol=1e-6)
