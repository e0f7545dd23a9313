"""Inertial multi-map: loss -> new map -> revisit -> gravity-aware merge.

The MergeLocal2/MergeInertialBA path (`/root/reference/src/LoopClosing.cc:1648`,
`src/Optimizer.cc:6048`): both maps IMU-initialize independently; the merge
must be 4-DoF (yaw + translation, scale 1), carry velocity/bias tables, and
keep the concatenated IMU chain usable (junction marked invalid).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import GRAVITY
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.inertial_atlas import (
    InertialAtlasSLAM,
    yaw_only,
)
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 160.0, 120.0))
FPS = 10.0
IMU_HZ = 200.0


def cam_pose(t):
    """Smooth laterally-excited trajectory that re-visits early viewpoints
    (period 2*pi/0.95 ~ 6.6 s in x/yaw)."""
    twc = np.array([
        0.25 * np.sin(0.95 * t) + 0.2 * np.sin(3.8 * t),
        0.15 * np.cos(4.6 * t) - 0.15,
        0.18 * np.sin(1.9 * t),
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


def test_yaw_only_projection():
    R = np.asarray(so3.exp(jnp.asarray([0.05, -0.03, 0.7])))
    Ry = yaw_only(R)
    # rotation about z only, orthonormal, and close to R in yaw
    assert np.allclose(Ry[2], [0, 0, 1], atol=1e-12)
    assert np.allclose(Ry @ Ry.T, np.eye(3), atol=1e-12)
    assert abs(np.arctan2(Ry[1, 0], Ry[0, 0]) - 0.7) < 0.06


@pytest.mark.slow
def test_inertial_atlas_merge():
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, fps=FPS,
        n_features=600, max_keyframes=64, max_map_points=8192,
        local_window=5, kf_max_interval=3, min_tracked_points=12,
        imu_init_time=1.2, imu_viba1_time=1e9, imu_viba2_time=1e9,
        imu_init_min_kfs=5, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=IMU_HZ,
        vocab_words=256,
    )
    room = BoxRoom(seed=3)
    atlas = InertialAtlasSLAM(cfg)
    atlas.active.LOST_PATIENCE if hasattr(atlas.active, "LOST_PATIENCE") else 0

    def feed(i, t, t_prev, blind=False):
        Rwc, twc = cam_pose(t)
        img = (np.zeros((H, W), np.float32) if blind
               else room.render(Rwc, twc, CAM.params, W, H))
        acc, gyr, ts = imu_between(t_prev, t)
        atlas.process(img, i, t=t, acc=acc, gyr=gyr, imu_t=ts)

    i = 0
    t_prev = 0.0
    # --- map A: track long enough to IMU-initialize ---
    for k in range(30):
        t = (i + 1) / FPS
        feed(i, t, t_prev)
        t_prev = t
        i += 1
    stage_a = atlas.active.imu_stage
    assert stage_a >= 1, "map A never IMU-initialized"

    # --- blind: lose tracking, open a new map ---
    while atlas.maps_created == 1 and i < 60:
        t = (i + 1) / FPS
        feed(i, t, t_prev, blind=True)
        t_prev = t
        i += 1
    assert atlas.maps_created == 2
    assert atlas.stored and atlas.stored[0].inertial is not None
    assert atlas.stored[0].inertial["imu_stage"] >= 1

    # --- map B: re-see the room (trajectory revisits), init + IMU init,
    #     then merge back ---
    for k in range(60):
        t = (i + 1) / FPS
        feed(i, t, t_prev)
        t_prev = t
        i += 1
        if atlas.merges:
            break
    assert atlas.merges == 1, (
        f"no merge: maps={atlas.n_maps} stage={atlas.active.imu_stage} "
        f"nkf={atlas.active.n_kf}"
    )
    a = atlas.active
    # chain welded: one invalid junction segment, orders strictly consistent
    assert a.seg_ok.count(False) == 1
    assert len(a.seg_preints) == len(a.kf_order) - 1
    assert len(a.seg_ok) == len(a.seg_preints)
    # velocities carried: the last keyframe's speed should be near the true
    # body speed (smooth trajectory, ~0.3-0.6 m/s)
    v = np.asarray(a.cur_vel)
    assert np.isfinite(v).all()
    # keep tracking after the merge without dying
    for k in range(5):
        t = (i + 1) / FPS
        feed(i, t, t_prev)
        t_prev = t
        i += 1
    assert atlas.trajectory[-1].state in ("OK", "RECENTLY_LOST")
