"""End-to-end stereo SLAM on a synthetic rendered sequence.

Stereo gives metric scale, so ATE is evaluated with fix_scale (SE3 Horn)
and additionally the recovered scale must be ~1.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import StereoSLAM
from orb_slam3_noted_tpu.utils.evaluation import ate_rmse
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory, stereo_pair


@pytest.mark.slow
def test_stereo_slam_synthetic_room():
    W, H = 320, 240
    fx = 260.0
    baseline = 0.12
    cam = Camera(PINHOLE, (fx, fx, W / 2 - 0.5, H / 2 - 0.5))
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=600,
        bf=fx * baseline, th_depth=35.0,
        max_keyframes=32, max_map_points=4096,
        local_window=5, kf_max_interval=10,
    )
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(30, forward=0.03)
    slam = StereoSLAM(cfg)
    for i, (Rwc, twc) in enumerate(poses):
        left, right, _ = stereo_pair(room, Rwc, twc, cam.params, W, H, baseline)
        slam.process(left, right, i)

    ok = np.array([r.state == "OK" for r in slam.trajectory])
    assert ok.sum() >= 25, f"only {ok.sum()} tracked frames"
    est = slam.positions()
    gt = np.stack([p[1] for p in poses])
    # metric scale: SE3 alignment (no scale correction)
    rmse, _, _ = ate_rmse(est[ok], gt[ok], with_scale=False)
    span = np.linalg.norm(gt[ok].max(0) - gt[ok].min(0))
    assert rmse < 0.05 * span, f"metric ATE {rmse:.3f} m over {span:.2f} m"
    # scale should be intrinsically right (within 3%)
    _, _, (_, _, s) = ate_rmse(est[ok], gt[ok], with_scale=True)
    assert abs(s - 1.0) < 0.10, f"stereo scale drifted: {s}"
