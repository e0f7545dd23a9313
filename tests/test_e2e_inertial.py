"""End-to-end monocular-inertial SLAM on a synthetic scene.

The metric test the reference motivates (`Changelog.md:33`: scale error <5%
within seconds of IMU init): render a textured room along an analytically
known trajectory, synthesize exact IMU, run MonoInertialSLAM, and require
that after the staged IMU initialization the recovered trajectory is
metric (scale ~1) and gravity-aligned.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import GRAVITY
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.inertial_system import MonoInertialSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 160.0, 120.0))
FPS = 10.0
IMU_HZ = 200.0


def cam_pose(t):
    """World->camera (Rcw, tcw). Camera looks +z into the room, with a
    smooth laterally accelerating motion (enough excitation for IMU init)."""
    twc = np.array([
        0.22 * np.sin(3.8 * t),
        0.15 * np.cos(4.6 * t) - 0.15,
        0.18 * np.sin(1.9 * t) + 0.08 * t,
    ])
    Rwc = np.asarray(so3.exp(jnp.asarray([
        0.06 * np.sin(1.1 * t), 0.08 * np.sin(0.7 * t), 0.04 * np.cos(1.3 * t)
    ])))
    Rcw = Rwc.T
    tcw = -Rcw @ twc
    return Rcw, tcw, Rwc, twc


def imu_between(t0, t1):
    """Exact IMU samples in the body(=camera) frame over (t0, t1]."""
    # world gravity: -z (the test world is already gravity-aligned; the
    # estimator must *discover* that)
    g = np.array([0.0, 0.0, -GRAVITY])
    eps = 1e-4
    ts = np.arange(np.ceil(t0 * IMU_HZ), np.floor(t1 * IMU_HZ) + 1) / IMU_HZ
    ts = ts[(ts > t0 + 1e-12) & (ts <= t1 + 1e-12)]
    acc, gyr = [], []
    for t in ts:
        _, _, Rwb, p = cam_pose(t)
        _, _, _, pp = cam_pose(t + eps)
        _, _, _, pm = cam_pose(t - eps)
        a_w = (pp - 2 * p + pm) / (eps * eps)
        _, _, Rwb_p, _ = cam_pose(t + eps)
        w_b = np.asarray(so3.log(jnp.asarray(Rwb.T @ Rwb_p))) / eps
        acc.append(Rwb.T @ (a_w - g))
        gyr.append(w_b)
    return np.asarray(acc), np.asarray(gyr), ts


@pytest.mark.slow
def test_mono_inertial_recovers_metric_scale():
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, fps=FPS,
        n_features=600, max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=3, min_tracked_points=12,
        imu_init_time=1.5, imu_viba1_time=2.5, imu_viba2_time=1e9,
        imu_init_min_kfs=5, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=IMU_HZ,
    )
    room = BoxRoom(seed=0, depth=2.5, h=1.2, w=1.8)
    slam = MonoInertialSLAM(cfg)
    n_frames = 36
    gt_twc = []
    t_prev = -1.0 / FPS
    for i in range(n_frames):
        t = i / FPS
        Rcw, tcw, Rwc, twc = cam_pose(t)
        img = room.render(Rwc, twc, CAM.params, W, H)
        acc, gyr, ts = imu_between(t_prev, t)
        slam.process(img, i, t=t, acc=acc, gyr=gyr, imu_t=ts)
        gt_twc.append(twc)
        t_prev = t
    gt = np.asarray(gt_twc)

    assert slam.imu_stage >= 1, "IMU initialization never ran"
    # use the post-init tail of the trajectory
    est = slam.positions()
    n_tail = 12
    E = est[-n_tail:] - est[-n_tail:].mean(0)
    G = gt[-n_tail:] - gt[-n_tail:].mean(0)
    # similarity alignment scale (Horn): s = sum(svals)/sum(|E|^2) after
    # optimal rotation; a metric map must give s ~ 1
    U, sv, Vt = np.linalg.svd(G.T @ E)
    s = sv.sum() / (E * E).sum()
    assert abs(s - 1.0) < 0.25, f"scale error too large: s={s:.3f}"
    # aligned ATE
    d = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
    R = U @ d @ Vt
    ate = np.sqrt(((G - s * E @ R.T) ** 2).sum(-1).mean())
    assert ate < 0.08, f"post-init ATE too large: {ate:.3f} m"


@pytest.mark.slow
def test_mono_inertial_gravity_alignment():
    """After init the map's z axis must be the (negated) gravity direction:
    world-frame camera 'down' should match the true one."""
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, fps=FPS,
        n_features=600, max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=3, min_tracked_points=12,
        imu_init_time=1.5, imu_viba1_time=1e9, imu_viba2_time=1e9,
        imu_init_min_kfs=5, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=IMU_HZ,
    )
    room = BoxRoom(seed=1, depth=2.5, h=1.2, w=1.8)
    slam = MonoInertialSLAM(cfg)
    t_prev = -1.0 / FPS
    n_frames = 24
    last_gt_Rcw = None
    for i in range(n_frames):
        t = i / FPS
        Rcw, tcw, Rwc, twc = cam_pose(t)
        img = room.render(Rwc, twc, CAM.params, W, H)
        acc, gyr, ts = imu_between(t_prev, t)
        slam.process(img, i, t=t, acc=acc, gyr=gyr, imu_t=ts)
        t_prev = t
        last_gt_Rcw = Rcw
    assert slam.imu_stage >= 1
    rec = slam.trajectory[-1]
    # camera-frame gravity direction must agree between estimate and truth
    g_cam_est = rec.Rcw @ np.array([0.0, 0.0, -1.0])
    g_cam_true = last_gt_Rcw @ np.array([0.0, 0.0, -1.0])
    cosang = float(np.dot(g_cam_est, g_cam_true))
    assert cosang > 0.98, f"gravity misaligned: cos={cosang:.3f}"
