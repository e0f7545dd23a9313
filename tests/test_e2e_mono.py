"""End-to-end monocular SLAM on a synthetic rendered sequence (phase E).

The hermetic analogue of the reference's dataset runs (SURVEY §4): render a
camera sweep through a textured box room, run the full pipeline (extract ->
init -> track -> keyframes -> local BA), and gate on Sim3-aligned ATE.
"""

import numpy as np
import pytest

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.evaluation import ate_rmse
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory


@pytest.mark.slow
def test_mono_slam_synthetic_room():
    W, H = 320, 240
    cam = Camera(PINHOLE, (260.0, 260.0, W / 2 - 0.5, H / 2 - 0.5))
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=600,
        max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=10,
    )
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(40, forward=0.03, yaw0=0.45)
    slam = MonoSLAM(cfg)
    for i, (Rwc, twc) in enumerate(poses):
        img = room.render(Rwc, twc, cam.params, W, H)
        slam.process(img, i)

    ok = np.array([r.state == "OK" for r in slam.trajectory])
    assert ok.sum() >= 34, f"only {ok.sum()} tracked frames"
    est = slam.positions()
    gt = np.stack([p[1] for p in poses])
    rmse, _, _ = ate_rmse(est[ok], gt[ok], with_scale=True)
    span = np.linalg.norm(gt[ok].max(0) - gt[ok].min(0))
    # round-2 bar: < 2% of trajectory span (round 1: 5%) and near-full
    # tracking (corner view — a plane-dominated view is degenerate for mono
    # init).  The residual ~1.7% is integer-pixel corner noise at this
    # resolution (fx=260): measured invariant to pose-opt iterations, BA
    # depth, anchored windows, and relative-pose trajectory bookkeeping.
    assert rmse < 0.02 * span, f"ATE {rmse:.3f} m over span {span:.2f} m"
