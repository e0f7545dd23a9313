import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.ops import fast as F
from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops import pallas_kernels as pk
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

W, H, nfeat = 752, 480, 1200
room = BoxRoom(seed=0)
poses = orbit_trajectory(16, forward=0.03, yaw0=0.45)
frames = np.stack([room.render(R, t, (458.0,457.0,376.0,240.0), W, H) for R, t in poses]).astype(np.uint8)
imgs = jnp.asarray(frames)
B = 16

def real_time(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

pyr_fn = jax.jit(lambda x: jax.vmap(lambda im: tuple(I.build_pyramid(im, 8, 1.2)))(x.astype(jnp.float32)))
real_time("pyramid x16", pyr_fn, imgs)
pyr = pyr_fn(imgs)

fs = jax.jit(lambda x: [jax.vmap(pk.fast_score)(p) for p in x])
real_time("fast_score 8 lvls x16", fs, pyr)
scores = fs(pyr)

budgets = F.level_budgets(nfeat, 8, 1.2)
dl = jax.jit(lambda s: [jax.vmap(lambda sc: F.detect_level(sc, n_out=b, th_high=20.0, th_low=7.0, border=16))(sc) for sc, b in zip(s, budgets)])
real_time("detect 8 lvls x16", dl, scores)
kps = dl(scores)

blur = jax.jit(lambda x: [jax.vmap(lambda im: pk.gaussian_blur7(im, 2.0))(p) for p in x])
real_time("blur 8 lvls x16", blur, pyr)
blurs = blur(pyr)

ic = jax.jit(lambda x, k: [jax.vmap(O.ic_angles)(p, kk.xy) for p, kk in zip(x, k)])
real_time("ic_angles 8 lvls x16", ic, pyr, kps)
angs = ic(pyr, kps)

bd = jax.jit(lambda bl, k, a: [jax.vmap(O.brief_descriptors)(b_, kk.xy, aa) for b_, kk, aa in zip(bl, k, a)])
real_time("brief 8 lvls x16", bd, blurs, kps, angs)
