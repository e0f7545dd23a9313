import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops.stereo import match_stereo
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory, stereo_pair

W, H, nfeat = 752, 480, 1200
cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
cfg = SlamConfig(camera=cam, width=W, height=H, n_features=nfeat, bf=0.11*458.654)
room = BoxRoom(seed=0)
poses = orbit_trajectory(16, forward=0.03, yaw0=0.45)
pairs = [stereo_pair(room, R, t, cam.params, W, H, 0.11)[:2] for R, t in poses]
L = jnp.asarray(np.stack([p[0] for p in pairs]).astype(np.uint8))
Rr = jnp.asarray(np.stack([p[1] for p in pairs]).astype(np.uint8))
B = 16

def real_time(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

@partial(jax.jit)
def extract32(L, Rr):
    both = jnp.concatenate([L, Rr], 0).astype(jnp.float32)
    return O.extract_orb_batch(both, n_features=nfeat)
real_time("extract 32 imgs", extract32, L, Rr)

@partial(jax.jit)
def full_front(L, Rr):
    both = jnp.concatenate([L, Rr], 0).astype(jnp.float32)
    pyr = jax.vmap(lambda im: tuple(I.build_pyramid(im, 8, 1.2)))(both)
    feats2 = jax.vmap(partial(O.extract_from_pyramid, n_features=nfeat))(tuple(pyr))
    fl = jax.tree_util.tree_map(lambda x: x[:B], feats2)
    fr = jax.tree_util.tree_map(lambda x: x[B:], feats2)
    pl = tuple(p[:B] for p in pyr); pr = tuple(p[B:] for p in pyr)
    sm = jax.vmap(lambda a,b,c,d: match_stereo(a,b,c,d, bf=cfg.bf, baseline=0.11))(fl, fr, pl, pr)
    return sm
real_time("extract+pyr+stereo match 16", full_front, L, Rr)

# mono extract for comparison
@partial(jax.jit)
def extract16(L):
    return O.extract_orb_batch(L.astype(jnp.float32), n_features=nfeat)
real_time("extract 16 imgs", extract16, L)
