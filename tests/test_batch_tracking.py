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


@pytest.mark.slow
def test_stereo_batch_mode_tracks():
    """Stereo throughput mode: batched L/R extraction + vmapped stereo match
    + scanned tracking with 3-row observations (round-3 batched stereo)."""
    from orb_slam3_noted_tpu.pipeline.system import StereoSLAM
    from orb_slam3_noted_tpu.utils.synthetic import stereo_pair

    W, H = 320, 240
    cam = Camera(PINHOLE, (260.0, 260.0, W / 2 - 0.5, H / 2 - 0.5))
    bf = 0.11 * 260.0
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=600,
        bf=bf, th_depth=45.0,
        max_keyframes=32, max_map_points=4096, local_window=4,
        kf_max_interval=8,
    )
    room = BoxRoom(seed=0)
    n = 18
    poses = orbit_trajectory(n, forward=0.04, yaw0=0.3)
    pairs = [
        stereo_pair(room, R, t, cam.params, W, H, 0.11)[:2] for R, t in poses
    ]
    s = StereoSLAM(cfg)
    i = 0
    while i < n and s.state == "NOT_INITIALIZED":
        s.process(pairs[i][0], pairs[i][1], i)
        i += 1
    B = 6
    while i < n:
        j = min(i + B, n)
        s.process_batch(pairs[i:j], list(range(i, j)))
        i = j

    ok = np.array([r.state == "OK" for r in s.trajectory])
    assert ok.sum() >= n - 3, f"only {ok.sum()}/{n} tracked"
    est = s.positions()
    gt = np.stack([p[1] for p in poses])
    rmse, _, _ = ate_rmse(est[ok], gt[ok], with_scale=False)
    assert rmse < 0.05, f"stereo batch ATE {rmse:.3f} m (metric scale)"
