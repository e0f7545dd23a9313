import time, jax, jax.numpy as jnp, numpy as np
key = jax.random.PRNGKey(0)
B, K, S = 16, 1200, 512
H, W = 480, 752
imgs = jax.random.normal(key, (B, H, W))
gy = jax.random.randint(key, (B, K, S), 0, H)
gx = jax.random.randint(key, (B, K, S), 0, W)

def real_time(name, fn, *args, n=5):
    out = fn(*args); np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args); np.asarray(out.ravel()[0])
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:8.2f} ms  shape {out.shape}")

taa = jax.jit(lambda im, y, x: jnp.take_along_axis(
    im.reshape(B, -1), (y * W + x).reshape(B, K * S), axis=1))
real_time("take_along_axis", taa, imgs, gy, gx)

taa8 = jax.jit(lambda im, y, x: jnp.take_along_axis(
    im.astype(jnp.uint8).reshape(B, -1), (y * W + x).reshape(B, K * S), axis=1))
real_time("take_along_axis uint8", taa8, imgs, gy, gx)

v2d = jax.jit(lambda im, y, x: jax.vmap(lambda i, yy, xx: i[yy, xx])(im, y, x))
real_time("2D advanced (ref)", v2d, imgs, gy, gx)
