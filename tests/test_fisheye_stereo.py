"""Fisheye (Kannala-Brandt) stereo: matching, triangulation, e2e tracking.

The TUM-VI stereo configuration of the reference (`/root/reference/src/
Frame.cc:1116` ComputeStereoFishEyeMatches, `src/CameraModels/
KannalaBrandt8.cpp:236` TriangulateMatches): non-rectified KB8 pair with a
known extrinsic.  Rendered through the library's own KB8 unprojection so the
geometry is exactly consistent.
"""

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, KANNALA_BRANDT8
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.ops.fisheye_stereo import match_fisheye_stereo
from orb_slam3_noted_tpu.pipeline.system import FisheyeStereoSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom

W = H = 384
# TUM-VI-like equidistant fisheye, scaled to the test resolution
CAM = Camera(
    KANNALA_BRANDT8,
    (160.0, 160.0, 191.5, 191.5, 0.0034, 0.00077, -0.0025, 0.00069),
)
BASELINE = 0.101


def _pair(room, Rwc, twc):
    left, depth = room.render_fisheye(Rwc, twc, CAM, W, H, return_depth=True)
    twc_r = twc + Rwc @ np.array([BASELINE, 0.0, 0.0])
    right = room.render_fisheye(Rwc, twc_r, CAM, W, H)
    return left, right, depth


def _cfg(**kw):
    base = dict(
        camera=CAM, camera2=CAM, width=W, height=H, n_features=800,
        bf=BASELINE * 160.0, th_depth=60.0,
        tlr_r=tuple(np.eye(3, dtype=np.float32).reshape(-1).tolist()),
        tlr_t=(BASELINE, 0.0, 0.0),
        lapping_l=(0.0, float(W)), lapping_r=(0.0, float(W)),
        max_keyframes=32, max_map_points=8192,
        local_window=5, kf_max_interval=6,
    )
    base.update(kw)
    return SlamConfig(**base)


def test_fisheye_stereo_depth(rng):
    # close-range room: at 0.1 m baseline the reference's parallax gate
    # (cos < 0.9998, ~1.15 deg) only passes points nearer than ~5 m
    room = BoxRoom(seed=3, depth=2.5, h=0.8, w=1.2)
    Rwc = np.eye(3)
    twc = np.zeros(3)
    left, right, depth_map = _pair(room, Rwc, twc)

    kw = dict(n_features=800, n_levels=8)
    fl = O.extract_orb(jnp.asarray(left, jnp.float32), **kw)
    fr = O.extract_orb(jnp.asarray(right, jnp.float32), **kw)
    sm = match_fisheye_stereo(
        fl, fr, CAM, CAM, jnp.eye(3), jnp.asarray([BASELINE, 0.0, 0.0]),
        lap_l=(0.0, float(W)), lap_r=(0.0, float(W)),
        level_sigma2=jnp.asarray(O.level_sigma2()),
    )
    valid = np.asarray(sm.valid)
    assert valid.sum() > 150, valid.sum()

    xy = np.asarray(fl.xy)[valid]
    est = np.asarray(sm.depth)[valid]
    gt = depth_map[
        np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1),
        np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1),
    ]
    # depth noise floor: ~1 px corner noise at fx=160 over a 0.1 m baseline
    # gives sigma_z/z ~ (1/fx) * z / B ~ 15% at 2.5 m — same as the
    # reference's fisheye stereo at this geometry
    rel = np.abs(est - gt) / gt
    assert np.median(rel) < 0.12, np.median(rel)
    assert (rel < 0.4).mean() > 0.85


def test_fisheye_stereo_slam_e2e(rng):
    from orb_slam3_noted_tpu.geometry import so3

    room = BoxRoom(seed=5, depth=2.5, h=0.8, w=1.2)
    cfg = _cfg()
    slam = FisheyeStereoSLAM(cfg)
    n = 10
    gt_centers = []
    for i in range(n):
        twc = np.array([0.02 * i, 0.005 * i, 0.015 * i])
        yaw = 0.01 * i
        Rwc = np.asarray(so3.exp(jnp.asarray([0.0, yaw, 0.0])))
        left, right, _ = _pair(room, Rwc, twc)
        slam.process(left, right, i)
        gt_centers.append(twc)
    ok = sum(1 for r in slam.trajectory if r.state == "OK")
    assert ok >= n - 1, [r.state for r in slam.trajectory]

    est = slam.positions()
    gt = np.stack(gt_centers)
    # metric scale from stereo: absolute (unaligned up to the first pose)
    err = np.linalg.norm((est - est[0]) - (gt - gt[0]), axis=1)
    span = np.linalg.norm(gt[-1] - gt[0])
    assert err.max() < 0.05 * span + 0.02, (err.max(), span)
