"""Loader for the reference's per-sequence YAML settings files.

Parses the exact schema consumed by ``Tracking::Parse{Cam,ORB,IMU}ParamFile``
(`/root/reference/src/Tracking.cc:490,1022,1106`; examples:
`Examples/Stereo-Inertial/EuRoC.yaml`, `TUM_512.yaml`) into a
:class:`SlamConfig` + IMU calibration, so existing dataset configs work
unchanged.  Uses ``cv2.FileStorage`` — the same parser as the reference.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, KANNALA_BRANDT8, PINHOLE


def _read(fs, key, default=None):
    node = fs.getNode(key)
    if node.empty():
        return default
    if node.isString():
        return node.string()
    if node.isReal() or node.isInt():
        return node.real()
    return node.mat()


def load_settings(path: str):
    """Parse a reference YAML file.

    Returns (SlamConfig, imu_params | None) where imu_params is a dict with
    Tbc (4, 4), noise/walk densities and frequency when the file has an IMU
    section.
    """
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)

    cam_type = _read(fs, "Camera.type", "PinHole")
    fx = float(_read(fs, "Camera.fx"))
    fy = float(_read(fs, "Camera.fy"))
    cx = float(_read(fs, "Camera.cx"))
    cy = float(_read(fs, "Camera.cy"))

    if cam_type == "KannalaBrandt8":
        ks = [float(_read(fs, f"Camera.k{i+1}", 0.0)) for i in range(4)]
        camera = Camera(KANNALA_BRANDT8, (fx, fy, cx, cy, *ks))
        dist = ()
    else:
        camera = Camera(PINHOLE, (fx, fy, cx, cy))
        d = [
            float(_read(fs, "Camera.k1", 0.0) or 0.0),
            float(_read(fs, "Camera.k2", 0.0) or 0.0),
            float(_read(fs, "Camera.p1", 0.0) or 0.0),
            float(_read(fs, "Camera.p2", 0.0) or 0.0),
            float(_read(fs, "Camera.k3", 0.0) or 0.0),
        ]
        dist = tuple(d) if any(abs(x) > 0 for x in d) else ()

    # --- second camera: non-rectified fisheye stereo (reference
    # ``Tracking::ParseCamParamFile`` Camera2.* + Tlr + lapping areas,
    # `/root/reference/src/Tracking.cc:724-815`; schema:
    # `Examples/Stereo-Inertial/TUM_512.yaml`) ---
    cam2 = None
    tlr_r: tuple = ()
    tlr_t = (0.0, 0.0, 0.0)
    lap_l = (0.0, 1e9)
    lap_r = (0.0, 1e9)
    fx2 = _read(fs, "Camera2.fx")
    if fx2 is not None:
        p2 = [float(fx2), float(_read(fs, "Camera2.fy")),
              float(_read(fs, "Camera2.cx")), float(_read(fs, "Camera2.cy"))]
        if cam_type == "KannalaBrandt8":
            p2 += [float(_read(fs, f"Camera2.k{i+1}", 0.0) or 0.0)
                   for i in range(4)]
            cam2 = Camera(KANNALA_BRANDT8, tuple(p2))
        else:
            cam2 = Camera(PINHOLE, tuple(p2))
        tlr = _read(fs, "Tlr")
        if tlr is not None:
            tlr = np.asarray(tlr, np.float64)
            if tlr.size == 16:
                tlr = tlr.reshape(4, 4)
            else:
                tlr = tlr.reshape(3, 4)
            tlr_r = tuple(tlr[:3, :3].reshape(-1).tolist())
            tlr_t = tuple(tlr[:3, 3].tolist())
        lb = _read(fs, "Camera.lappingBegin")
        le = _read(fs, "Camera.lappingEnd")
        if lb is not None and le is not None:
            lap_l = (float(lb), float(le))
        lb2 = _read(fs, "Camera2.lappingBegin")
        le2 = _read(fs, "Camera2.lappingEnd")
        if lb2 is not None and le2 is not None:
            lap_r = (float(lb2), float(le2))

    cfg = SlamConfig(
        camera=camera,
        camera2=cam2,
        tlr_r=tlr_r, tlr_t=tlr_t,
        lapping_l=lap_l, lapping_r=lap_r,
        width=int(_read(fs, "Camera.width", 752)),
        height=int(_read(fs, "Camera.height", 480)),
        fps=float(_read(fs, "Camera.fps", 30.0)),
        bf=float(_read(fs, "Camera.bf", 0.0) or 0.0),
        th_depth=float(_read(fs, "ThDepth", 35.0) or 35.0),
        dist_coeffs=dist,
        n_features=int(_read(fs, "ORBextractor.nFeatures", 1200)),
        n_levels=int(_read(fs, "ORBextractor.nLevels", 8)),
        scale_factor=float(_read(fs, "ORBextractor.scaleFactor", 1.2)),
        ini_th_fast=float(_read(fs, "ORBextractor.iniThFAST", 20)),
        min_th_fast=float(_read(fs, "ORBextractor.minThFAST", 7)),
    )

    imu = None
    tbc = _read(fs, "Tbc")
    if tbc is not None:
        freq = float(_read(fs, "IMU.Frequency", 200.0))
        # raw continuous densities; SlamConfig.imu_calib applies the same
        # discretization as the reference (src/Tracking.cc:1106+):
        # noise density * sqrt(freq); walk density / sqrt(freq)
        imu = dict(
            Tbc=np.asarray(tbc, np.float64).reshape(4, 4),
            freq=freq,
            noise_gyro=float(_read(fs, "IMU.NoiseGyro")),
            noise_acc=float(_read(fs, "IMU.NoiseAcc")),
            walk_gyro=float(_read(fs, "IMU.GyroWalk")),
            walk_acc=float(_read(fs, "IMU.AccWalk")),
        )
        # fold the IMU section into the typed config so imu_calib() works
        Rbc = imu["Tbc"][:3, :3]
        tbc_v = imu["Tbc"][:3, 3]
        cfg = dataclasses.replace(
            cfg,
            imu_rbc=tuple(Rbc.reshape(-1).tolist()),
            imu_tbc=tuple(tbc_v.tolist()),
            imu_noise_gyro=imu["noise_gyro"],
            imu_noise_acc=imu["noise_acc"],
            imu_walk_gyro=imu["walk_gyro"],
            imu_walk_acc=imu["walk_acc"],
            imu_freq=freq,
        )
    fs.release()
    return cfg, imu


def load_stereo_rectification(path: str):
    """LEFT./RIGHT. K, D, R, P blocks used by the stereo example drivers
    (`Examples/Stereo-Inertial/stereo_inertial_euroc.cc:124-151`)."""
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    out = {}
    for side in ("LEFT", "RIGHT"):
        blk = {}
        for key in ("K", "D", "R", "P"):
            v = _read(fs, f"{side}.{key}")
            if v is not None:
                blk[key] = np.asarray(v, np.float64)
        if blk:
            blk["height"] = int(_read(fs, f"{side}.height", 0))
            blk["width"] = int(_read(fs, f"{side}.width", 0))
            out[side] = blk
    fs.release()
    return out or None
