"""RGB-D SLAM end-to-end: depth-seeded metric map, tracked trajectory.

Reference RGB-D mode: depth -> virtual right coordinate
(``Frame::ComputeStereoFromRGBD``), single-frame initialization, depth-seeded
map points.  With perfect depth, the recovered trajectory must be metric —
positions comparable to ground truth without scale alignment.
"""

import numpy as np
import pytest

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import RGBDSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 160.0, 120.0))


@pytest.mark.slow
def test_rgbd_slam_metric_tracking():
    baseline = 0.08
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, n_features=600,
        max_keyframes=32, max_map_points=4096,
        local_window=4, kf_max_interval=6,
        bf=baseline * CAM.fx, th_depth=40.0,
    )
    room = BoxRoom(seed=4)
    poses = orbit_trajectory(18, forward=0.03)
    slam = RGBDSLAM(cfg)
    gt = []
    for i, (Rwc, twc) in enumerate(poses):
        img, depth = room.render(Rwc, twc, CAM.params, W, H, return_depth=True)
        slam.process(img, depth, i)
        gt.append(twc)
    gt = np.asarray(gt)

    ok = sum(1 for r in slam.trajectory if r.state == "OK")
    assert ok >= 14, f"only {ok} tracked frames"
    est = slam.positions()
    # the estimator's world frame IS the first camera frame: express the
    # ground-truth camera centers there (no scale alignment — RGB-D is metric)
    Rwc0, twc0 = poses[0]
    gt_c0 = (gt - twc0) @ Rwc0  # Rcw0 @ (twc - twc0) row-wise
    err = np.linalg.norm(est - gt_c0, axis=1)
    rmse = np.sqrt((err**2).mean())
    # reference headline accuracy is cm-level ATE (README.md:20, ~3.5 cm on
    # EuRoC); require the same class here with exact synthetic depth
    # 0.055: the distinctive-descriptor re-election (MapPoint::
    # ComputeDistinctiveDescriptors parity) shifts matching slightly on
    # dense depth-seeded maps (measured 0.039 -> 0.045 on this scene);
    # the reference runs the same election
    assert rmse < 0.055, f"RGB-D ATE too large: rmse={rmse:.3f} m"
    assert err.max() < 0.10, f"RGB-D max error too large: {err.max():.3f} m"
