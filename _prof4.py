import time, jax, jax.numpy as jnp
from rl_collision_avoidance_tpu.models import CNNPolicy

B = 3072
def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

for dtype, xd in ((jnp.bfloat16, jnp.bfloat16), (jnp.bfloat16, jnp.float32), (jnp.float32, jnp.float32)):
    m = CNNPolicy(dtype=dtype)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1,3,512)), jnp.zeros((1,2)), jnp.zeros((1,2)))
    x = jnp.zeros((B,3,512), xd); g = jnp.zeros((B,2), xd); s = jnp.zeros((B,2), xd)
    timeit(f"CNNPolicy model={dtype.__name__} in={xd.__name__}", jax.jit(lambda p,x,g,s: m.apply(p,x,g,s)), p, x, g, s)
