import time, dataclasses, jax, jax.numpy as jnp, numpy as np
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline import tracking as T
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
print("map", slam.n_kf, slam.n_mp)

def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

cfg11 = dataclasses.replace(cfg, ba_iters=1, ba_iters_final=1)
cfg00 = dataclasses.replace(cfg, ba_iters=0, ba_iters_final=0)
timeit("local_ba 0+0 (obs build only)", lambda: T.local_ba(m, jnp.int32(slam.last_kf_slot), cam, cfg00, window=cfg.local_window))
timeit("local_ba 1+1", lambda: T.local_ba(m, jnp.int32(slam.last_kf_slot), cam, cfg11, window=cfg.local_window))
timeit("local_ba 5+5", lambda: T.local_ba(m, jnp.int32(slam.last_kf_slot), cam, cfg, window=cfg.local_window))
