import time, jax, jax.numpy as jnp, numpy as np
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (8, 3, 3))
y = jax.random.normal(key, (8, 3))
z = jax.random.normal(key, (8,))
big = jax.random.normal(key, (8192, 256))
f = jax.jit(lambda x: x + 1.0)
np.asarray(f(x))

def lap(name, fn, n=10):
    t0 = time.perf_counter()
    for _ in range(n): fn()
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

lap("pull tiny (8,3,3)", lambda: np.asarray(f(x)))
lap("pull 3 arrays separately", lambda: (np.asarray(f(x)), np.asarray(f(y)), np.asarray(f(z))))
lap("pull 3 via device_get", lambda: jax.device_get((f(x), f(y), f(z))))
lap("pull big (8192,256)=8MB", lambda: np.asarray(f(big)))
def concat_pull():
    a = jnp.concatenate([f(x).reshape(-1), f(y).reshape(-1), f(z).reshape(-1)])
    return np.asarray(a)
lap("pull 3 concat single", concat_pull)
# async copy overlap
def async3():
    a, b, c = f(x), f(y), f(z)
    for v in (a, b, c): v.copy_to_host_async()
    return np.asarray(a), np.asarray(b), np.asarray(c)
lap("pull 3 copy_to_host_async", async3)
