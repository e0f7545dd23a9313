import time, jax, jax.numpy as jnp

def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (11296, 3, 6))
y = jax.random.normal(key, (11296, 3, 3))

@jax.jit
def chain100(x, y):
    acc = jnp.zeros((11296, 6, 3))
    for i in range(100):
        acc = acc + jnp.einsum("oai,oaj->oij", x + float(i), y)
    return acc

timeit("100 chained einsums (O,3,6)", lambda: chain100(x, y))

@jax.jit
def chain10(x, y):
    acc = jnp.zeros((11296, 6, 3))
    for i in range(10):
        acc = acc + jnp.einsum("oai,oaj->oij", x + float(i), y)
    return acc

timeit("10 chained einsums", lambda: chain10(x, y))

idx = jax.random.randint(key, (11296,), 0, 64)
tbl = jax.random.normal(key, (64, 3, 3))
@jax.jit
def gathers(idx):
    acc = jnp.zeros((11296, 3, 3))
    for i in range(50):
        acc = acc + tbl[(idx + i) % 64]
    return acc
timeit("50 chained gathers", lambda: gathers(idx))
