import time, os, jax, jax.numpy as jnp, numpy as np
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
print("map", slam.n_kf, slam.n_mp, "impl", os.environ.get("SLAM_SEGSUM", "mxu"))

def real_time(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms (incl ~5ms pull)")

real_time("local_ba 5+5 REAL", T.local_ba, m, jnp.int32(slam.last_kf_slot), cam, cfg)
