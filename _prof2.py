import time, jax, jax.numpy as jnp, numpy as np
from rl_collision_avoidance_tpu.worlds import stage1
from rl_collision_avoidance_tpu.engine import make_env, culling

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

p1 = pose[0]
r_x = jax.jit(env_x._scan_obs)(p1)
r_p = jax.jit(env_p._scan_obs)(p1)
diff = np.abs(np.asarray(r_x) - np.asarray(r_p)).max()
print("max scan diff xla vs pallas:", diff)

def pallas_batch(pose):
    culled = jax.vmap(lambda p: culling.cull_segments(p[:, :2], env_p._seg_p, env_p._seg_e, env_p._seg_valid, spec.cull_k))(pose)
    return env_p._pallas_scan(pose, culled)
pb = jax.jit(pallas_batch)
timeit("pallas lidar batched (incl culling)", pb, pose)

vm = jax.jit(jax.vmap(env_p._scan_obs))
timeit("pallas lidar vmapped", vm, pose)

step_fn = jax.jit(jax.vmap(env_p.step))
state, obs = jax.jit(jax.vmap(env_p.reset))(jax.random.split(key, A))
act = jnp.zeros((A, spec.n_robots, 2))
timeit("env.step pallas", step_fn, state, act)
