import time, jax, jax.numpy as jnp, numpy as np
f = jax.jit(lambda x, y: (x @ y).sum())
xd = jnp.eye(3); yd = jnp.ones((3,3))
xn = np.eye(3, dtype=np.float32); yn = np.ones((3,3), np.float32)
jax.block_until_ready(f(xd, yd)); jax.block_until_ready(f(xn, yn))

def lap(name, fn, n=20):
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    v = float(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

lap("jit call device args", lambda: f(xd, yd))
lap("jit call numpy args (upload)", lambda: f(xn, yn))
big = np.random.rand(8, 752, 480).astype(np.uint8)
g = jax.jit(lambda x: x.astype(jnp.float32).sum())
jax.block_until_ready(g(big))
lap("upload 2.9MB batch + op", lambda: g(big), n=5)
