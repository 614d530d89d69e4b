import time, jax, jax.numpy as jnp, numpy as np
from rl_collision_avoidance_tpu.worlds import stage1
from rl_collision_avoidance_tpu.engine import make_env

A = 128
spec = stage1()
env_x = make_env(spec, use_pallas=False)
env_p = make_env(spec, use_pallas=True)
key = jax.random.PRNGKey(0)
pose = jax.random.uniform(key, (A, spec.n_robots, 3), minval=-8, maxval=8)

def timeit(name, fn, *args, n=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")
    return out

r_x = jax.jit(env_x._scan_obs)(pose)
r_p = jax.jit(env_p._scan_obs)(pose)
print("max scan diff xla vs pallas:", float(jnp.abs(r_x - r_p).max()))

timeit("pallas lidar batched", jax.jit(env_p._scan_obs), pose)

step_fn = jax.jit(env_p.step)
state, obs = jax.jit(env_p.reset)(jax.random.split(key, A))
act = jnp.zeros((A, spec.n_robots, 2))
timeit("env.step pallas", step_fn, state, act)
