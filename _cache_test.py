import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
key = jax.random.PRNGKey(0)
O, S, F = 76800, 8193, 256
datas = [jax.random.normal(jax.random.PRNGKey(i), (O, F)) for i in range(8)]
seg = jax.random.randint(key, (O,), 0, S)
ss = jax.jit(partial(jax.ops.segment_sum, num_segments=S))
jax.block_until_ready(ss(datas[0], seg))

# same input each time
t0 = time.perf_counter()
for i in range(16): out = ss(datas[0], seg)
jax.block_until_ready(out)
print(f"same input : {(time.perf_counter()-t0)/16*1000:8.3f} ms")

# different input each time
t0 = time.perf_counter()
for i in range(16): out = ss(datas[i % 8], seg)
jax.block_until_ready(out)
print(f"diff input : {(time.perf_counter()-t0)/16*1000:8.3f} ms")
