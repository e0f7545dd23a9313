"""Batched stereo-inertial tracking (`vi_track_batch` + `process_batch`).

The BASELINE gate configuration is EuRoC stereo-inertial; round 4 adds the
throughput mode.  This test drives `StereoInertialSLAM.process_batch` on a
synthetic room with exact IMU and requires (a) the staged IMU init still
runs, (b) the batch path keeps tracking, and (c) the trajectory stays
metric (scale ~1, bounded ATE) — the same accuracy gates as the per-frame
stereo-inertial path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import GRAVITY
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.inertial_system import StereoInertialSLAM
from orb_slam3_noted_tpu.utils.evaluation import ate_rmse
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, stereo_pair

W, H = 320, 240
FX = 260.0
BASELINE = 0.12
CAM = Camera(PINHOLE, (FX, FX, W / 2 - 0.5, H / 2 - 0.5))
FPS = 10.0
IMU_HZ = 200.0


def cam_pose(t):
    twc = np.array([
        0.22 * np.sin(3.8 * t),
        0.15 * np.cos(4.6 * t) - 0.15,
        0.18 * np.sin(1.9 * t) + 0.08 * t,
    ])
    Rwc = np.asarray(so3.exp(jnp.asarray([
        0.06 * np.sin(1.1 * t), 0.08 * np.sin(0.7 * t), 0.04 * np.cos(1.3 * t)
    ])))
    return Rwc, twc


def imu_between(t0, t1):
    g = np.array([0.0, 0.0, -GRAVITY])
    eps = 1e-4
    ts = np.arange(np.ceil(t0 * IMU_HZ), np.floor(t1 * IMU_HZ) + 1) / IMU_HZ
    ts = ts[(ts > t0 + 1e-12) & (ts <= t1 + 1e-12)]
    acc, gyr = [], []
    for t in ts:
        Rwb, p = cam_pose(t)
        _, pp = cam_pose(t + eps)
        _, pm = cam_pose(t - eps)
        a_w = (pp - 2 * p + pm) / (eps * eps)
        Rwb_p, _ = cam_pose(t + eps)
        w_b = np.asarray(so3.log(jnp.asarray(Rwb.T @ Rwb_p))) / eps
        acc.append(Rwb.T @ (a_w - g))
        gyr.append(w_b)
    return np.asarray(acc), np.asarray(gyr), ts


@pytest.mark.slow
def test_stereo_inertial_batched_tracking():
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, fps=FPS,
        n_features=600, bf=FX * BASELINE, th_depth=35.0,
        max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=4, min_tracked_points=12,
        imu_init_time=1.0, imu_viba1_time=1e9, imu_viba2_time=1e9,
        imu_init_min_kfs=4, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=IMU_HZ,
    )
    room = BoxRoom(seed=0, depth=2.5, h=1.2, w=1.8)
    slam = StereoInertialSLAM(cfg)
    n_frames = 32
    batch = 8
    gt_twc = []
    t_prev = -1.0 / FPS
    frames, times = [], []
    for i in range(n_frames):
        t = i / FPS
        Rwc, twc = cam_pose(t)
        left, right, _ = stereo_pair(
            room, Rwc, twc, CAM.params, W, H, BASELINE
        )
        frames.append((left, right))
        times.append(t)
        gt_twc.append(twc)
    for s0 in range(0, n_frames, batch):
        s1 = min(s0 + batch, n_frames)
        acc_l, gyr_l, ts_l = [], [], []
        for j in range(s0, s1):
            a, w, ts_j = imu_between(t_prev, times[j])
            acc_l.append(a); gyr_l.append(w); ts_l.append(ts_j)
            t_prev = times[j]
        acc = np.concatenate(acc_l); gyr = np.concatenate(gyr_l)
        ts_all = np.concatenate(ts_l)
        slam.process_batch(
            frames[s0:s1], list(range(s0, s1)), ts=times[s0:s1],
            acc=acc, gyr=gyr, imu_t=ts_all,
        )
    gt = np.asarray(gt_twc)

    assert slam.imu_stage >= 1, "IMU initialization never ran"
    ok = np.array([r.state == "OK" for r in slam.trajectory])
    assert ok.sum() >= 24, f"only {ok.sum()} tracked frames"
    # the batched VI path must actually have been exercised
    assert any(
        r.state == "OK" for r in slam.trajectory[-(n_frames - 16):]
    ), "no tracked frames in the batched phase"
    est = slam.positions()
    rmse, _, _ = ate_rmse(est[ok], gt[ok], with_scale=False)
    span = np.linalg.norm(gt[ok].max(0) - gt[ok].min(0))
    assert rmse < 0.08 * span, f"metric ATE {rmse:.3f} m over {span:.2f} m"
    _, _, (_, _, s) = ate_rmse(est[ok], gt[ok], with_scale=True)
    assert abs(s - 1.0) < 0.12, f"scale drifted: {s}"
