"""Fisheye (Kannala-Brandt) stereo-inertial e2e — the TUM-VI gate config.

Reference: IMU_STEREO with two KannalaBrandt8 cameras
(`/root/reference/src/Tracking.cc:724-815` Camera2/Tlr parsing,
`src/Frame.cc:1041-1140` fisheye stereo frame, two-camera inertial edges of
`include/G2oTypes.h:339-489`).  Renders a KB8 pair along an analytically
known trajectory with exact IMU, runs ``FisheyeStereoInertialSLAM``, and
requires the staged IMU init to run with METRIC scale (stereo fixes scale)
and the trajectory to stay within an absolute ATE bound.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import GRAVITY
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, KANNALA_BRANDT8
from orb_slam3_noted_tpu.pipeline.inertial_system import FisheyeStereoInertialSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom

W = H = 384
CAM = Camera(
    KANNALA_BRANDT8,
    (160.0, 160.0, 191.5, 191.5, 0.0034, 0.00077, -0.0025, 0.00069),
)
BASELINE = 0.101
FPS = 10.0
IMU_HZ = 200.0


def cam_pose(t):
    twc = np.array([
        0.20 * np.sin(3.8 * t),
        0.12 * np.cos(4.6 * t) - 0.12,
        0.15 * np.sin(1.9 * t) + 0.06 * t,
    ])
    Rwc = np.asarray(so3.exp(jnp.asarray([
        0.05 * np.sin(1.1 * t), 0.07 * np.sin(0.7 * t), 0.04 * np.cos(1.3 * t)
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


def _pair(room, Rwc, twc):
    left = room.render_fisheye(Rwc, twc, CAM, W, H)
    twc_r = twc + Rwc @ np.array([BASELINE, 0.0, 0.0])
    right = room.render_fisheye(Rwc, twc_r, CAM, W, H)
    return left, right


@pytest.mark.slow
def test_fisheye_stereo_inertial_e2e():
    cfg = SlamConfig(
        camera=CAM, camera2=CAM, width=W, height=H, fps=FPS,
        n_features=700, bf=BASELINE * 160.0, th_depth=60.0,
        tlr_r=tuple(np.eye(3, dtype=np.float32).reshape(-1).tolist()),
        tlr_t=(BASELINE, 0.0, 0.0),
        lapping_l=(0.0, float(W)), lapping_r=(0.0, float(W)),
        max_keyframes=32, max_map_points=8192,
        local_window=5, kf_max_interval=4, min_tracked_points=12,
        imu_init_time=0.8, imu_viba1_time=2.0, imu_viba2_time=1e9,
        imu_init_min_kfs=4, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=IMU_HZ,
    )
    room = BoxRoom(seed=5, depth=2.5, h=0.9, w=1.4)
    slam = FisheyeStereoInertialSLAM(cfg)
    n_frames = 30
    gt_twc = []
    t_prev = -1.0 / FPS
    for i in range(n_frames):
        t = i / FPS
        Rwc, twc = cam_pose(t)
        left, right = _pair(room, Rwc, twc)
        acc, gyr, ts = imu_between(t_prev, t)
        slam.process(left, right, i, t=t, acc=acc, gyr=gyr, imu_t=ts)
        gt_twc.append(twc)
        t_prev = t
    gt = np.asarray(gt_twc)

    assert slam.imu_stage >= 1, "IMU init never ran on the fisheye VI path"
    ok = sum(1 for r in slam.trajectory if r.state == "OK")
    assert ok >= n_frames - 2, [r.state for r in slam.trajectory]

    # METRIC accuracy, no similarity alignment: stereo fixes scale, IMU
    # fixes gravity — only the initial pose gauge is free
    est = slam.positions()
    err = np.linalg.norm((est - est[0]) - (gt - gt[0]), axis=1)
    span = np.ptp(gt, axis=0).max()
    assert np.median(err) < 0.08 * span + 0.02, (np.median(err), span)

    # two-camera observations actually entered the map (kf_xy_r rows live)
    xyr = np.asarray(slam.m.kf_xy_r[:3])
    assert (xyr[..., 0] >= 0).sum() > 50, "no right-camera observations bound"
