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
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

f2d = jax.jit(lambda im, y, x: jax.vmap(lambda i, yy, xx: i[yy, xx])(im, y, x))
real_time("2D advanced index", f2d, imgs, gy, gx)

fflat = jax.jit(lambda im, y, x: jax.vmap(lambda i, yy, xx: jnp.take(i.reshape(-1), yy * W + xx))(im, y, x))
real_time("flat take", fflat, imgs, gy, gx)

fflat2 = jax.jit(lambda im, y, x: jnp.take(im.reshape(B, -1), (y * W + x).reshape(B, K*S), axis=1))
real_time("flat take axis=1 batched", fflat2, imgs, gy, gx)

# one flat take over the whole batch (linearize batch too)
fflat3 = jax.jit(lambda im, y, x: jnp.take(
    im.reshape(-1),
    ((jnp.arange(B)[:, None, None] * H + y) * W + x).reshape(-1)))
real_time("flat take global", fflat3, imgs, gy, gx)

# row-sorted locality
gys = jnp.sort(gy, axis=1)
real_time("2D sorted rows", f2d, imgs, gys, gx)
