import time, jax, jax.numpy as jnp, numpy as np
key = jax.random.PRNGKey(0)
B, K, S, P = 16, 1200, 512, 1369
img = jax.random.normal(key, (B, 480, 752))
patches = jax.random.normal(key, (B, K, P))
idx = jax.random.randint(key, (B, K, S), 0, P)

def real_time(name, fn, *args, n=5):
    out = fn(*args); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args); np.asarray(out.ravel()[0])
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

# small-row gather: (K, 1369) -> (K, 512) per frame
taa = jax.jit(lambda p, i: jnp.take_along_axis(p, i, axis=2))
real_time("take_along_axis rows (B,K,1369)->512", taa, patches, idx)

# one-hot dot per kp chunk (iota-compare fused into dot?)
@jax.jit
def onehot_dot(p, i):
    oh = (i[..., None] == jnp.arange(P)[None, None, None, :]).astype(jnp.bfloat16)  # (B,K,S,P)
    return jnp.einsum("bksp,bkp->bks", oh, p.astype(jnp.bfloat16))
real_time("one-hot dot (B,K,S,P)", onehot_dot, patches, idx)

# patch extraction via row gather: rows (B, K*37) of width 752 -> then col slice
rows = jax.random.randint(key, (B, K, 37), 0, 480)
cols = jax.random.randint(key, (B, K), 0, 700)
@jax.jit
def patch_rows(img, rows, cols):
    r = jnp.take_along_axis(img.reshape(B, 480, 752), rows.reshape(B, K*37)[..., None], axis=1)  # (B, K*37, 752)
    ci = cols[:, :, None, None] + jnp.arange(37)[None, None, None, :]
    ci = jnp.clip(ci, 0, 751)
    out = jnp.take_along_axis(r.reshape(B, K, 37, 752), ci, axis=3)
    return out
real_time("patch via row-gather + col-taa", patch_rows, img, rows, cols)
