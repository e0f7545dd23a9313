"""Batched (throughput-mode) tracking must match per-frame tracking closely."""

import numpy as np
import pytest

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.evaluation import ate_rmse
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory


@pytest.mark.slow
def test_batch_mode_tracks():
    W, H = 320, 240
    cam = Camera(PINHOLE, (260.0, 260.0, W / 2 - 0.5, H / 2 - 0.5))
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=600,
        max_keyframes=32, max_map_points=4096, local_window=5, kf_max_interval=10,
    )
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(36, forward=0.03)
    frames = [room.render(R, t, cam.params, W, H) for R, t in poses]

    slam = MonoSLAM(cfg)
    B = 6
    i = 0
    while i < len(frames) and slam.state == "NOT_INITIALIZED":
        slam.process(frames[i], i)
        i += 1
    while i < len(frames):
        j = min(i + B, len(frames))
        slam.process_batch(frames[i:j], list(range(i, j)))
        i = j

    ok = np.array([r.state == "OK" for r in slam.trajectory])
    assert ok.sum() >= 15, f"only {ok.sum()} tracked"
    est = slam.positions()
    gt = np.stack([p[1] for p in poses])
    rmse, _, _ = ate_rmse(est[ok], gt[ok], with_scale=True)
    span = np.linalg.norm(gt[ok].max(0) - gt[ok].min(0))
    assert rmse < 0.07 * span, f"batch-mode ATE {rmse:.3f} over {span:.2f}"
