"""System facade modes: localization-only, reset, lost-state timers.

Reference parity: ``System::ActivateLocalizationMode`` (`src/System.cc:173`),
``System::Reset`` (`:358`), RECENTLY_LOST->LOST grace timers
(`include/Tracking.h:311-312`).
"""

import numpy as np

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import LOST, MonoSLAM, RECENTLY_LOST
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 159.5, 119.5))


def _cfg(**kw):
    base = dict(
        camera=CAM, width=W, height=H, n_features=600, fps=10.0,
        max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=5,
    )
    base.update(kw)
    return SlamConfig(**base)


def _run(slam, frames, start=0):
    for i, f in enumerate(frames):
        slam.process(f, start + i)


def test_localization_mode_freezes_map():
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(24, forward=0.03, yaw0=0.45)
    frames = [room.render(R, t, CAM.params, W, H) for R, t in poses]
    slam = MonoSLAM(_cfg())
    _run(slam, frames[:12])
    n_kf = slam.n_kf
    n_mp = slam.n_mp
    assert n_kf >= 2
    slam.set_localization_mode(True)
    _run(slam, frames[12:], start=12)
    assert slam.n_kf == n_kf, "localization mode must not insert keyframes"
    assert slam.n_mp == n_mp, "localization mode must not create points"
    assert slam.trajectory[-1].state == "OK", "tracking should continue"


def test_reset_clears_everything():
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(12, forward=0.03, yaw0=0.45)
    frames = [room.render(R, t, CAM.params, W, H) for R, t in poses]
    slam = MonoSLAM(_cfg())
    _run(slam, frames)
    assert slam.n_kf >= 2
    slam.reset()
    assert slam.n_kf == 0 and slam.n_mp == 0
    assert slam.state == "NOT_INITIALIZED"
    assert not bool(np.asarray(slam.m.kf_valid).any())
    # system re-initializes cleanly after the reset
    _run(slam, frames, start=100)
    assert slam.n_kf >= 2


def test_recently_lost_degrades_to_lost():
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(12, forward=0.03, yaw0=0.45)
    frames = [room.render(R, t, CAM.params, W, H) for R, t in poses]
    slam = MonoSLAM(_cfg())
    _run(slam, frames)
    black = np.zeros((H, W), np.float32)
    states = []
    for k in range(slam.lost_patience + 3):
        slam.process(black, 100 + k)
        states.append(slam.trajectory[-1].state)
    assert RECENTLY_LOST in states, states
    assert states[-1] == LOST, states
