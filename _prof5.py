import time, jax, jax.numpy as jnp
from rl_collision_avoidance_tpu.worlds import stage1
from rl_collision_avoidance_tpu.ops.lidar_pallas import make_scan_fn
from rl_collision_avoidance_tpu.engine import make_env

spec = stage1()
env = make_env(spec, use_pallas=True)
key = jax.random.PRNGKey(0)

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt=(time.perf_counter()-t0)/n
    print(f"{name}: {dt*1000:.2f} ms")
    return dt

for A in (128, 512):
    pose = jax.random.uniform(key, (A, spec.n_robots, 3), minval=-8, maxval=8)
    culled = jax.jit(env._culled_for)(pose[..., :2])
    for g in (8, 16, 32):
        fn = make_scan_fn(spec.n_beams, spec.fov, spec.robot_radius, spec.max_range, arenas_per_program=g)
        dt = timeit(f"A={A} g={g}", lambda p, c: fn(p, c), pose, culled)
