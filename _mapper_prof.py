import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline import tracking as T
from orb_slam3_noted_tpu.pipeline import map_state as MS
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

W, H, nfeat = 752, 480, 1200
cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
cfg = SlamConfig(camera=cam, width=W, height=H, n_features=nfeat,
                 max_keyframes=64, max_map_points=8192,
                 local_window=5, kf_max_interval=10)
room = BoxRoom(seed=0)
poses = orbit_trajectory(12, forward=0.025)
frames = [room.render(R, t, cam.params, W, H) for R, t in poses]
slam = MonoSLAM(cfg)
for i in range(len(frames)):
    slam.process(frames[i], i)
m = slam.m
slot = jnp.int32(slam.last_kf_slot)
print("map", slam.n_kf, slam.n_mp)

def real_time(name, fn, *args, n=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

real_time("local_ba 4+3", T.local_ba, m, slot, cam, cfg)
tri8 = jax.jit(lambda m, s: jax.vmap(lambda nb: T.triangulate_between(m, s, nb, cam, cfg))(jnp.arange(8, dtype=jnp.int32)))
real_time("triangulate x8 vmap", tri8, m, slot)
mask, _ = MS.local_map_mask(m, slot, n_neighbors=cfg.local_window)
real_time("fuse_map_points", jax.jit(lambda m, s, mk: T.fuse_map_points(m, s, mk, cam, cfg)), m, slot, mask)
real_time("cull_map_points", jax.jit(MS.cull_map_points), m, slot)
real_time("update_point_stats", jax.jit(lambda m, mk: MS.update_point_stats(m, mk)), m, mask)
protect = jnp.zeros(64, bool).at[slot].set(True)
real_time("cull_keyframes", jax.jit(MS.cull_keyframes), m, mask[:64] if mask.shape[0]>=64 else jnp.ones(64,bool), protect)
