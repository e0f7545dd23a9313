"""Stereo-inertial-only bench lap (fast iteration on the VI path).

Same configuration as bench.py's VI lap; prints the stage table and one
JSON line.  Run on the TPU: python scripts/bench_vi.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.inertial_system import StereoInertialSLAM
from orb_slam3_noted_tpu.utils.synthetic import (
    BoxRoom, smooth_pose, stereo_pair, synth_imu,
)
from orb_slam3_noted_tpu.utils.timing import GLOBAL_TIMER, StageTimer

W, H, nfeat = 752, 480, 1200
cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
fps_cam, imu_hz, B = 20.0, 200.0, 16
bf = 0.11 * 458.654
cfg_vi = SlamConfig(
    camera=cam, width=W, height=H, n_features=nfeat, fps=fps_cam,
    bf=bf, th_depth=45.0,
    max_keyframes=64, max_map_points=16384,
    local_window=5, kf_max_interval=10, min_tracked_points=15,
    imu_init_time=0.9, imu_viba1_time=2.5, imu_viba2_time=1e9,
    imu_init_min_kfs=3, inertial_window=8,
    imu_noise_gyro=1.7e-4, imu_noise_acc=2e-3,
    imu_walk_gyro=1.9e-5, imu_walk_acc=3e-3, imu_freq=imu_hz,
)
n_vi = 96
room = BoxRoom(seed=0)
times_vi = [i / fps_cam for i in range(n_vi)]
pairs_np = []
for t in times_vi:
    Rwc, twc = smooth_pose(t)
    pairs_np.append(stereo_pair(room, Rwc, twc, cam.params, W, H, 0.11)[:2])
Lv = jax.device_put(np.stack([p[0] for p in pairs_np]).astype(np.uint8))
Rv = jax.device_put(np.stack([p[1] for p in pairs_np]).astype(np.uint8))
pairs = [(Lv[i], Rv[i]) for i in range(n_vi)]
imu_chunks = []
t_prev = -1.0 / fps_cam
for s0 in range(0, n_vi, B):
    s1 = min(s0 + B, n_vi)
    a, g, ts_i = synth_imu(t_prev, times_vi[s1 - 1], hz=imu_hz)
    imu_chunks.append((a, g, ts_i))
    t_prev = times_vi[s1 - 1]


def run_vi():
    sv = StereoInertialSLAM(cfg_vi)
    for ci, s0 in enumerate(range(0, n_vi, B)):
        s1 = min(s0 + B, n_vi)
        a, g, ts_i = imu_chunks[ci]
        sv.process_batch(pairs[s0:s1], list(range(s0, s1)),
                         ts=times_vi[s0:s1], acc=a, gyr=g, imu_t=ts_i)
    return sv


t0 = time.time()
run_vi()
print(f"warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)
StageTimer.enabled = True
GLOBAL_TIMER.spans.clear()
t0 = time.time()
sv = run_vi()
wall = time.time() - t0
GLOBAL_TIMER.print_stats(file=sys.stderr)
ok = sum(1 for r in sv.trajectory if r.state == "OK")
print(json.dumps({
    "metric": "stereo_inertial_tracked_fps_752x480_1200feat",
    "value": round(n_vi / wall, 2), "unit": "frames/s",
    "vs_baseline": round(n_vi / wall / 20.0, 3),
    "tracked_frames": ok, "n_frames": n_vi, "imu_stage": sv.imu_stage,
}))
