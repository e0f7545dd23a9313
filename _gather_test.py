import time, jax, jax.numpy as jnp
key = jax.random.PRNGKey(0)
O, K, MP = 12496, 65, 8192
Rcw = jax.random.normal(key, (K, 3, 3))
pts = jax.random.normal(key, (MP, 3))
pidx = jax.random.randint(key, (O,), 0, K)
midx = jax.random.randint(key, (O,), 0, MP)

def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.3f} ms")

timeit("gather pose (O from 65)", jax.jit(lambda: Rcw[pidx]))
timeit("gather points (O from 8192)", jax.jit(lambda: pts[midx]))

@jax.jit
def onehot_pose():
    oh = (pidx[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    return (oh @ Rcw.reshape(K, 9)).reshape(O, 3, 3)
timeit("onehot matmul pose", onehot_pose)

@jax.jit
def onehot_pts():
    oh = (midx[:, None] == jnp.arange(MP)[None, :]).astype(jnp.bfloat16)
    return jax.lax.dot_general(oh, pts.astype(jnp.bfloat16), (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
timeit("onehot matmul points bf16", onehot_pts)

@jax.jit
def take_pts():
    return jnp.take(pts, midx, axis=0, unique_indices=False, indices_are_sorted=False)
timeit("jnp.take points", take_pts)

sidx = jnp.sort(midx)
timeit("gather points sorted idx", jax.jit(lambda: jnp.take(pts, sidx, axis=0, indices_are_sorted=True)))

# gather whole rows at once: combine into one big table gather (R|t -> 12 cols)
tcw = jax.random.normal(key, (K, 3))
both = jnp.concatenate([Rcw.reshape(K, 9), tcw], 1)
timeit("gather fused pose12", jax.jit(lambda: both[pidx]))
