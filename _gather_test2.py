import time, jax, jax.numpy as jnp
key = jax.random.PRNGKey(0)
O, K, MP = 12496, 65, 8192
Rcw = jax.random.normal(key, (K, 3, 3))
pts = jax.random.normal(key, (MP, 3))
pidx = jax.random.randint(key, (O,), 0, K)
midx = jax.random.randint(key, (O,), 0, MP)

def timeit(name, fn, *args, n=30):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

timeit("gather pose", jax.jit(lambda R, i: R[i]), Rcw, pidx)
timeit("gather points", jax.jit(lambda p, i: p[i]), pts, midx)
timeit("noop add", jax.jit(lambda p, i: p + 1.0), pts, midx)

@jax.jit
def three_gathers(R, t, p, pi, mi):
    return R[pi], t[pi], p[mi]
tcw = jax.random.normal(key, (K, 3))
timeit("3 gathers one jit", three_gathers, Rcw, tcw, pts, pidx, midx)

@jax.jit
def chain5(p, i):
    acc = p[i]
    for k in range(4):
        acc = acc + p[(i + k) % MP]
    return acc
timeit("5 chained gathers", chain5, pts, midx)
