"""Checkpoint/resume: save a live map, restore into a fresh system, keep
tracking.  (The feature the reference left as TODO: `include/System.h:159`.)"""

import numpy as np
import pytest

from orb_slam3_noted_tpu.io.checkpoint import load_map, save_map
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 160.0, 120.0))


def make_cfg():
    return SlamConfig(
        camera=CAM, width=W, height=H, n_features=600,
        max_keyframes=32, max_map_points=4096,
        local_window=4, kf_max_interval=6,
    )


@pytest.mark.slow
def test_save_load_roundtrip(tmp_path):
    cfg = make_cfg()
    room = BoxRoom(seed=2)
    poses = orbit_trajectory(20, forward=0.03)
    frames = [room.render(R, t, CAM.params, W, H) for R, t in poses]

    slam = MonoSLAM(cfg)
    for i in range(14):
        slam.process(frames[i], i)
    assert slam.n_kf >= 2

    path = str(tmp_path / "map.npz")
    save_map(path, slam)

    slam2 = MonoSLAM(cfg)
    load_map(path, slam2)
    assert slam2.n_kf == slam.n_kf
    assert slam2.n_mp == slam.n_mp
    assert slam2.state == slam.state
    np.testing.assert_array_equal(
        np.asarray(slam2.m.mp_pos), np.asarray(slam.m.mp_pos)
    )
    np.testing.assert_array_equal(
        np.asarray(slam2.m.kf_desc), np.asarray(slam.m.kf_desc)
    )
    assert len(slam2.trajectory) == len(slam.trajectory)

    # resumed system must keep tracking the remaining frames
    ok = 0
    for i in range(14, 20):
        rec = slam2.process(frames[i], i)
        ok += rec.state == "OK"
    assert ok >= 4, "resumed system lost tracking"


def test_shape_mismatch_rejected(tmp_path):
    cfg = make_cfg()
    slam = MonoSLAM(cfg)
    path = str(tmp_path / "map.npz")
    save_map(path, slam)
    other = SlamConfig(
        camera=CAM, width=W, height=H, n_features=500,
        max_keyframes=32, max_map_points=4096,
    )
    slam2 = MonoSLAM(other)
    with pytest.raises(ValueError, match="n_features"):
        load_map(path, slam2)
