import time, jax, jax.numpy as jnp, numpy as np
f = jax.jit(lambda x, y: (x @ y).sum())
xd = jnp.eye(3); yd = jnp.ones((3,3))
xn = np.eye(3, dtype=np.float32); yn = np.ones((3,3), np.float32)
jax.block_until_ready(f(xd, yd)); jax.block_until_ready(f(xn, yn))

def lap(name, fn, n=20):
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    mid = (time.perf_counter()-t0)/n*1000
    v = float(outs[-1])
    tot = (time.perf_counter()-t0)/n*1000
    print(f"{name:40s} enq {mid:8.2f} ms  +pull {tot:8.2f} ms")

for rep in range(3):
    lap("numpy args (upload)", lambda: f(xn, yn))
    lap("device args", lambda: f(xd, yd))
