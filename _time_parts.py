import time, jax, jax.numpy as jnp, numpy as np

def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (36, 36)); A = A @ A.T + 36*jnp.eye(36)
b = jax.random.normal(key, (36,))
solve = jax.jit(lambda A, b: jnp.linalg.solve(A, b))
timeit("linalg.solve 36", lambda: solve(A, b))
chol = jax.jit(lambda A, b: jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(A), b))
timeit("cho_solve 36", lambda: chol(A, b))

# segment_sum to M*(KW+1)
O = 11296; M = 8192; KW = 6
W_o = jax.random.normal(key, (O, 6, 3))
keyi = jax.random.randint(key, (O,), 0, M*(KW+1))
ss = jax.jit(lambda w, k: jax.ops.segment_sum(w, k, num_segments=M*(KW+1)))
timeit("segsum U", lambda: ss(W_o, keyi))

U = jax.random.normal(key, (M, KW, 6, 3))
Cinv = jax.random.normal(key, (M, 3, 3))
f = jax.jit(lambda U, C: jnp.einsum("mpab,mbc->mpac", U, C, precision=jax.lax.Precision.HIGHEST))
timeit("T1 einsum", lambda: f(U, Cinv))
g = jax.jit(lambda T1, U: jnp.einsum("mpac,mqbc->paqb", T1, U, precision=jax.lax.Precision.HIGHEST))
T1 = f(U, Cinv)
timeit("S einsum", lambda: g(T1, U))
inv3_ = jax.jit(lambda H: jnp.linalg.inv(H))
H3 = jax.random.normal(key, (M,3,3)) + 5*jnp.eye(3)
timeit("inv (M,3,3)", lambda: inv3_(H3))
