"""FrameDrawer keypoint overlay (reference ``FrameDrawer::DrawFrame``,
`/root/reference/src/FrameDrawer.cc`): tracked keypoints drawn on the
current frame with a status bar — the per-frame half of the L9 viewer."""

import numpy as np

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory
from orb_slam3_noted_tpu.utils.viewer import draw_frame

W, H = 320, 240
CAM = Camera(PINHOLE, (260.0, 260.0, 160.0, 120.0))


def test_frame_overlay(tmp_path):
    cfg = SlamConfig(
        camera=CAM, width=W, height=H, n_features=500,
        max_keyframes=16, max_map_points=4096,
        local_window=4, kf_max_interval=6,
    )
    room = BoxRoom(seed=2)
    poses = orbit_trajectory(8, forward=0.03)
    slam = MonoSLAM(cfg)
    slam.keep_frame_overlay = True
    imgs = [room.render(R, t, CAM.params, W, H) for R, t in poses]
    for i, img in enumerate(imgs):
        slam.process(img, i)
    assert slam.last_overlay is not None, "overlay never recorded"
    ov = slam.last_overlay
    assert ov["matched"].sum() > 30, "too few matched keypoints in overlay"
    out = draw_frame(imgs[ov["frame_id"]], ov, path=str(tmp_path / "f.png"))
    assert out.shape == (H + 22, W, 3) and out.dtype == np.uint8
    # green match markers present
    green = (out[:, :, 1] > 200) & (out[:, :, 0] < 100) & (out[:, :, 2] < 100)
    assert green.sum() > 50
    assert (tmp_path / "f.png").exists()


def test_live_viewer_frame_endpoint():
    """The live HTTP viewer serves the FrameDrawer stream at /frame.png
    (reference: the Pangolin window's current-frame pane)."""
    import urllib.request

    from orb_slam3_noted_tpu.utils.viewer import LiveViewer

    cfg = SlamConfig(
        camera=CAM, width=W, height=H, n_features=500,
        max_keyframes=16, max_map_points=4096,
        local_window=4, kf_max_interval=6,
    )
    room = BoxRoom(seed=2)
    poses = orbit_trajectory(6, forward=0.03)
    slam = MonoSLAM(cfg)
    slam.keep_frame_overlay = True
    for i, (R, t) in enumerate(poses):
        slam.process(room.render(R, t, CAM.params, W, H), i)
    viewer = LiveViewer(slam, port=0)
    try:
        url = f"http://127.0.0.1:{viewer.port}/frame.png"
        body = urllib.request.urlopen(url, timeout=10).read()
        assert body[:8] == b"\x89PNG\r\n\x1a\n" and len(body) > 1000
    finally:
        viewer.close()
