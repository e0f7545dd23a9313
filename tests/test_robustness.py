"""Robustness plumbing: timestamp-sanity + bad-IMU reset (round-4 item 9).

Reference behaviors being matched:
- `src/Tracking.cc:1674-1712`: a frame older than its predecessor, or a
  >1 s timestamp jump, resets the active map (keeping it only when VIBA2
  already refined it) and restarts tracking.
- `src/LocalMapping.cc:142-149`: after IMU init, three consecutive
  keyframes moving < 2 cm total means inertial init was unobservable —
  reset the map (bad-IMU watchdog).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.inertial_system import StereoInertialSLAM
from orb_slam3_noted_tpu.utils.synthetic import (
    BoxRoom,
    smooth_pose,
    stereo_pair,
    synth_imu,
)

W, H = 320, 240
FX = 260.0
BASELINE = 0.12
CAM = Camera(PINHOLE, (FX, FX, W / 2 - 0.5, H / 2 - 0.5))
FPS = 10.0


def _cfg(**kw):
    base = dict(
        camera=CAM, width=W, height=H, fps=FPS,
        n_features=500, bf=FX * BASELINE, th_depth=35.0,
        max_keyframes=32, max_map_points=4096,
        local_window=4, kf_max_interval=4, min_tracked_points=12,
        imu_init_time=1.0, imu_viba1_time=1e9, imu_viba2_time=1e9,
        imu_init_min_kfs=4, inertial_window=6,
        imu_noise_gyro=1e-4, imu_noise_acc=1e-3,
        imu_walk_gyro=1e-6, imu_walk_acc=1e-5, imu_freq=200.0,
    )
    base.update(kw)
    return SlamConfig(**base)


def _drive(slam, room, t0, t1, frame0):
    """Feed frames at FPS over [t0, t1); returns next frame id."""
    i = frame0
    t = t0
    t_prev = slam.last_t if slam.last_t is not None else t0 - 1.0 / FPS
    while t < t1 - 1e-9:
        Rwc, twc = smooth_pose(t)
        left, right, _ = stereo_pair(room, Rwc, twc, CAM.params, W, H,
                                     BASELINE)
        acc, gyr, ts = synth_imu(t_prev, t)
        slam.process(left, right, i, t=t, acc=acc, gyr=gyr, imu_t=ts)
        t_prev = t
        t += 1.0 / FPS
        i += 1
    return i, t


@pytest.mark.slow
def test_timestamp_jump_resets_map():
    room = BoxRoom(seed=0, depth=2.5, h=1.2, w=1.8)
    slam = StereoInertialSLAM(_cfg())
    i, t = _drive(slam, room, 0.0, 2.0, 0)
    assert slam.imu_stage >= 1
    nkf_before = slam.n_kf
    assert nkf_before >= 3
    # 5-second gap in the stream: the map (not yet VIBA2-refined) must be
    # dropped and tracking must re-initialize from the current frame
    i, t = _drive(slam, room, t + 5.0, t + 5.7, i)
    assert slam.n_kf < nkf_before, "map survived a pre-VIBA2 timestamp jump"
    # ...and the system recovers: tracking OK again after re-init
    assert slam.trajectory[-1].state in ("OK", "NOT_INITIALIZED")
    i, t = _drive(slam, room, t, t + 1.0, i)
    assert slam.trajectory[-1].state == "OK", "no recovery after stream break"


@pytest.mark.slow
def test_backwards_timestamp_resets():
    room = BoxRoom(seed=0, depth=2.5, h=1.2, w=1.8)
    slam = StereoInertialSLAM(_cfg())
    i, t = _drive(slam, room, 0.0, 1.5, 0)
    assert slam.n_kf >= 2
    nkf = slam.n_kf
    # clock goes backwards by 10 s -> reset + fresh map
    i2, _ = _drive(slam, room, t - 10.0, t - 9.4, i)
    assert slam.n_kf <= nkf, "backwards timestamps did not reset"


def test_bad_imu_watchdog_unit():
    """Three near-stationary keyframes post-IMU-init trip the watchdog."""
    from orb_slam3_noted_tpu.pipeline import map_state as MS

    slam = StereoInertialSLAM(_cfg())
    slam.m = MS.empty_map(slam.cfg)
    # fabricate an initialized inertial state with 3 stationary keyframes
    slam.imu_stage = 1
    slam.state = "OK"
    slam.last_t = 1.0
    for k, tk in enumerate((0.0, 0.5, 1.0)):
        slam.m = slam.m._replace(
            kf_Rcw=slam.m.kf_Rcw.at[k].set(jnp.eye(3)),
            kf_tcw=slam.m.kf_tcw.at[k].set(
                jnp.asarray([0.001 * k, 0.0, 0.0])
            ),
            kf_valid=slam.m.kf_valid.at[k].set(True),
        )
        slam.kf_order.append(k)
        slam.kf_times.append(tk)
    assert slam._check_bad_imu(), "watchdog did not fire on 2 mm motion"
    assert slam.state == "NOT_INITIALIZED" and slam.imu_stage == 0
