"""CLI-driven fisheye stereo-inertial e2e — the TUM-VI gate config from a
TUM_512.yaml-format settings file.

Builds a TUM-VI (EuRoC-layout) directory with KB8 fisheye renders + exact
IMU csv, writes a reference-format YAML with ``Camera2.*``/``Tlr``/lapping
(`/root/reference/Examples/Stereo-Inertial/TUM_512.yaml`), and drives
``cli.main`` end-to-end: the CLI must route to
``FisheyeStereoInertialSLAM`` (Camera2 present), initialize the IMU, and
report a bounded metric ATE.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import GRAVITY
from orb_slam3_noted_tpu.models.cameras import Camera, KANNALA_BRANDT8
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom

W = H = 384
FX = 160.0
CAM = Camera(
    KANNALA_BRANDT8,
    (FX, FX, 191.5, 191.5, 0.0034, 0.00077, -0.0025, 0.00069),
)
BASELINE = 0.101
FPS = 10.0
IMU_HZ = 200.0
N_FRAMES = 24


def cam_pose(t):
    twc = np.array([
        0.20 * np.sin(3.8 * t),
        0.12 * np.cos(4.6 * t) - 0.12,
        0.15 * np.sin(1.9 * t) + 0.06 * t,
    ])
    Rwc = np.asarray(so3.exp(jnp.asarray([
        0.05 * np.sin(1.1 * t), 0.07 * np.sin(0.7 * t), 0.04 * np.cos(1.3 * t)
    ])))
    return Rwc, twc


def _write_tumvi(tmp_path):
    import cv2

    room = BoxRoom(seed=5, depth=2.5, h=0.9, w=1.4)
    for cam_name in ("cam0", "cam1", "imu0"):
        os.makedirs(tmp_path / "mav0" / cam_name / "data", exist_ok=True)
    os.makedirs(tmp_path / "mav0" / "state_groundtruth_estimate0",
                exist_ok=True)
    rows0, rows1, gt_rows = [], [], []
    for i in range(N_FRAMES):
        t = i / FPS
        Rwc, twc = cam_pose(t)
        left = room.render_fisheye(Rwc, twc, CAM, W, H)
        twc_r = twc + Rwc @ np.array([BASELINE, 0.0, 0.0])
        right = room.render_fisheye(Rwc, twc_r, CAM, W, H)
        ns = int(t * 1e9)
        name = f"{ns}.png"
        cv2.imwrite(str(tmp_path / "mav0" / "cam0" / "data" / name),
                    left.astype(np.uint8))
        cv2.imwrite(str(tmp_path / "mav0" / "cam1" / "data" / name),
                    right.astype(np.uint8))
        rows0.append(f"{ns},{name}")
        rows1.append(f"{ns},{name}")
        gt_rows.append(
            f"{ns},{twc[0]},{twc[1]},{twc[2]},1,0,0,0,0,0,0,0,0,0,0,0,0"
        )
    for cam_name, rows in (("cam0", rows0), ("cam1", rows1)):
        with open(tmp_path / "mav0" / cam_name / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n" + "\n".join(rows) + "\n")
    with open(
        tmp_path / "mav0" / "state_groundtruth_estimate0" / "data.csv", "w"
    ) as f:
        f.write("#ts,p\n" + "\n".join(gt_rows) + "\n")

    # exact IMU from the analytic trajectory (body frame == left camera)
    g = np.array([0.0, 0.0, -GRAVITY])
    eps = 1e-4
    imu_rows = []
    ts = np.arange(0, int((N_FRAMES / FPS) * IMU_HZ) + 1) / IMU_HZ
    for t in ts:
        Rwb, p = cam_pose(t)
        _, pp = cam_pose(t + eps)
        _, pm = cam_pose(t - eps)
        a_w = (pp - 2 * p + pm) / (eps * eps)
        Rwb_p, _ = cam_pose(t + eps)
        w_b = np.asarray(so3.log(jnp.asarray(Rwb.T @ Rwb_p))) / eps
        a_b = Rwb.T @ (a_w - g)
        imu_rows.append(
            f"{int(t * 1e9)},{w_b[0]},{w_b[1]},{w_b[2]},"
            f"{a_b[0]},{a_b[1]},{a_b[2]}"
        )
    with open(tmp_path / "mav0" / "imu0" / "data.csv", "w") as f:
        f.write("#timestamp,w,a\n" + "\n".join(imu_rows) + "\n")


def _write_settings(tmp_path):
    # TUM_512.yaml schema (reference `src/Tracking.cc:724-815` parsing)
    yaml = f"""%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera.fx: {FX}
Camera.fy: {FX}
Camera.cx: 191.5
Camera.cy: 191.5
Camera.k1: 0.0034
Camera.k2: 0.00077
Camera.k3: -0.0025
Camera.k4: 0.00069
Camera2.fx: {FX}
Camera2.fy: {FX}
Camera2.cx: 191.5
Camera2.cy: 191.5
Camera2.k1: 0.0034
Camera2.k2: 0.00077
Camera2.k3: -0.0025
Camera2.k4: 0.00069
Tlr: !!opencv-matrix
  rows: 3
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, {BASELINE},
         0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0]
Camera.lappingBegin: 0
Camera.lappingEnd: {W - 1}
Camera2.lappingBegin: 0
Camera2.lappingEnd: {W - 1}
Camera.width: {W}
Camera.height: {H}
Camera.fps: {FPS}
Camera.bf: {FX * BASELINE}
ThDepth: 60.0
Tbc: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, 0.0,
         0.0, 1.0, 0.0, 0.0,
         0.0, 0.0, 1.0, 0.0,
         0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1e-4
IMU.NoiseAcc: 1e-3
IMU.GyroWalk: 1e-6
IMU.AccWalk: 1e-5
IMU.Frequency: 200
ORBextractor.nFeatures: 700
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    path = tmp_path / "tumvi_512.yaml"
    path.write_text(yaml)
    return str(path)


def test_yaml_camera2_parsing(tmp_path):
    """Camera2/Tlr/lapping must round-trip through the YAML loader."""
    from orb_slam3_noted_tpu.io.yaml_compat import load_settings

    settings = _write_settings(tmp_path)
    cfg, imu = load_settings(settings)
    assert cfg.camera.kind == KANNALA_BRANDT8
    assert cfg.camera2 is not None
    assert cfg.camera2.kind == KANNALA_BRANDT8
    R = np.asarray(cfg.tlr_r).reshape(3, 3)
    assert np.allclose(R, np.eye(3))
    assert np.allclose(cfg.tlr_t, [BASELINE, 0, 0])
    assert cfg.lapping_l == (0.0, float(W - 1))
    assert cfg.lapping_r == (0.0, float(W - 1))
    assert imu is not None and imu["freq"] == 200.0


@pytest.mark.slow
def test_cli_fisheye_stereo_inertial(tmp_path, capsys):
    from orb_slam3_noted_tpu import cli

    _write_tumvi(tmp_path)
    settings = _write_settings(tmp_path)
    out = str(tmp_path / "traj_tum.txt")
    cli.main([
        "--dataset", "tumvi", "--seq", str(tmp_path),
        "--settings", settings, "--mode", "stereo-inertial",
        "--out", out, "--format", "tum", "--eval",
    ])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert res["tracked"] >= N_FRAMES - 3, res
    assert res["keyframes"] >= 3, res
    # metric ATE bound: stereo depth + IMU fix scale; the room spans ~0.5 m
    assert "ate_rmse_m" in res, res
    assert res["ate_rmse_m"] < 0.06, res
    # scale must be metric (mono alignment scale not applied for stereo)
    assert os.path.exists(out)
