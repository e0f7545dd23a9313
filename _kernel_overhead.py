import time, jax, jax.numpy as jnp, numpy as np
key = jax.random.PRNGKey(0)
tbl = jax.random.normal(key, (8192, 3))
idx = jax.random.randint(key, (2048,), 0, 8192)

def chain(n):
    @jax.jit
    def f(tbl, idx):
        acc = jnp.zeros((2048, 3))
        i = idx
        for k in range(n):
            i = (i * 1103515245 + 12345) % 8192  # force dependency, unfusable gather each step
            acc = acc + tbl[i]
        return acc
    return f

def real_time(name, fn, *args, n=10):
    out = fn(*args); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args); np.asarray(out.ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

f50 = chain(50); f200 = chain(200)
real_time("chain 50 gathers", f50, tbl, idx)
real_time("chain 200 gathers", f200, tbl, idx)

# dots: dependent small matmuls
A = jax.random.normal(key, (256, 256))
def dots(n):
    @jax.jit
    def f(A):
        x = A
        for _ in range(n):
            x = x @ A * 1e-2
        return x
    return f
d50 = dots(50); d200 = dots(200)
real_time("chain 50 matmul 256", d50, A)
real_time("chain 200 matmul 256", d200, A)
