import time, jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

B = 3072
x = jnp.zeros((B, 512, 3), jnp.bfloat16)

def timeit(name, fn, *args, n=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.2f} ms")

class Trunk(nn.Module):
    dtype: any = jnp.bfloat16
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (5,), (2,), padding=[(1,1)], dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(32, (3,), (2,), padding=[(1,1)], dtype=self.dtype)(x))
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(256, dtype=self.dtype)(x))

m = Trunk()
p = m.init(jax.random.PRNGKey(0), x[:1])
timeit("trunk (conv conv fc)", jax.jit(lambda p, x: m.apply(p, x)), p, x)

class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (5,), (2,), padding=[(1,1)], dtype=jnp.bfloat16)(x))
        return nn.relu(nn.Conv(32, (3,), (2,), padding=[(1,1)], dtype=jnp.bfloat16)(x))
c = ConvOnly(); pc = c.init(jax.random.PRNGKey(0), x[:1])
timeit("convs only", jax.jit(lambda p, x: c.apply(p, x)), pc, x)

# fc only
w = jnp.zeros((4096, 256), jnp.bfloat16)
xf = jnp.zeros((B, 4096), jnp.bfloat16)
timeit("fc 4096x256", jax.jit(lambda x, w: jnp.dot(x, w)), xf, w)

# conv1 as explicit matmul on unfolded patches
xpad = jnp.zeros((B, 514, 3), jnp.bfloat16)
wp = jnp.zeros((15, 32), jnp.bfloat16)
def conv_as_mm(x, w):
    # gather 255 windows of 5 via strided slicing + reshape... use lax.conv_general_dilated_patches
    pats = jax.lax.conv_general_dilated_patches(x, (5,), (2,), [(1,1)], dimension_numbers=('NLC','LIO','NLC'))
    return jnp.dot(pats, w)
timeit("conv1 via patches+mm", jax.jit(conv_as_mm), x, wp)
