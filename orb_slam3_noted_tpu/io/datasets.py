"""Dataset loaders: EuRoC, TUM-VI, KITTI layouts.

Equivalents of the reference's example-driver loaders
(`/root/reference/Examples/Stereo-Inertial/stereo_inertial_euroc.cc`
``LoadImages``/``LoadIMU``; `Examples/Monocular/mono_kitti.cc` etc.):
timestamp lists from the dataset csv/txt files, grayscale image loading,
optional stereo rectification maps, and per-frame IMU batching.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ImuData:
    t: np.ndarray    # (N,) seconds
    gyr: np.ndarray  # (N, 3)
    acc: np.ndarray  # (N, 3)

    def between(self, t0: float, t1: float) -> "ImuData":
        """Measurements with t0 < t <= t1 (reference batches (prev, cur])."""
        m = (self.t > t0) & (self.t <= t1)
        return ImuData(self.t[m], self.gyr[m], self.acc[m])


@dataclass
class Sequence:
    timestamps: np.ndarray           # (F,) seconds
    left_paths: list
    right_paths: list | None = None
    imu: ImuData | None = None
    gt_t: np.ndarray | None = None   # ground truth timestamps
    gt_pos: np.ndarray | None = None  # (G, 3)
    depth_paths: list | None = None  # RGB-D: registered depth image per frame
    depth_factor: float = 5000.0     # TUM-RGBD 16-bit depth scale (m = px/f)

    def __len__(self):
        return len(self.timestamps)

    def _native_loader(self, paths):
        """Native C++ prefetching PNG decoder (``native/slamrt.cpp``);
        returns None when unavailable (non-PNG data, build failure)."""
        if not paths or not paths[0].lower().endswith(".png"):
            return None
        try:
            from orb_slam3_noted_tpu.native import (
                PrefetchingLoader,
                load_image_gray,
            )

            probe = load_image_gray(paths[0])
            return PrefetchingLoader(
                paths, probe.shape[1], probe.shape[0],
                n_buffers=8, n_threads=2,
            )
        except Exception:
            return None

    def _read_side(self, paths, i, attr):
        loader = getattr(self, attr, None)
        if loader is None and not getattr(self, attr + "_failed", False):
            loader = self._native_loader(paths)
            object.__setattr__(self, attr, loader)
            if loader is None:
                object.__setattr__(self, attr + "_failed", True)
        if loader is not None:
            try:
                return loader.get(i).astype(np.float32)
            except Exception:
                object.__setattr__(self, attr, None)
                object.__setattr__(self, attr + "_failed", True)
        import cv2

        img = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(paths[i])
        return img.astype(np.float32)

    def read(self, i: int):
        """Grayscale float32 image(s) for frame i.

        Feeds through the native prefetcher (reference's producer/consumer
        image pipeline, SURVEY §2.3 row "queues") with a cv2 fallback.
        RGB-D sequences return (gray, depth_m) with depth in meters.
        """
        left = self._read_side(self.left_paths, i, "_lloader")
        if self.depth_paths is not None:
            import cv2

            d = cv2.imread(self.depth_paths[i], cv2.IMREAD_UNCHANGED)
            if d is None:
                raise FileNotFoundError(self.depth_paths[i])
            depth = d.astype(np.float32) / self.depth_factor
            return left, depth
        if self.right_paths is not None:
            right = self._read_side(self.right_paths, i, "_rloader")
            return left, right
        return left


def _load_euroc_cam(seq_dir: str, cam: str):
    data_csv = os.path.join(seq_dir, "mav0", cam, "data.csv")
    ts, paths = [], []
    with open(data_csv) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.strip().split(",")
            ts.append(int(parts[0]) * 1e-9)
            paths.append(os.path.join(seq_dir, "mav0", cam, "data", parts[1].strip()))
    return np.asarray(ts), paths


def load_euroc(seq_dir: str, stereo: bool = True, with_imu: bool = True) -> Sequence:
    """EuRoC MAV layout: mav0/cam0, cam1, imu0, state_groundtruth_estimate0."""
    ts, left = _load_euroc_cam(seq_dir, "cam0")
    right = None
    if stereo:
        ts1, right = _load_euroc_cam(seq_dir, "cam1")
        # intersect by timestamp (the reference assumes synchronized streams)
        common = np.intersect1d(ts, ts1)
        keep0 = np.isin(ts, common)
        keep1 = np.isin(ts1, common)
        left = [p for p, k in zip(left, keep0) if k]
        right = [p for p, k in zip(right, keep1) if k]
        ts = ts[keep0]

    imu = None
    if with_imu:
        imu_csv = os.path.join(seq_dir, "mav0", "imu0", "data.csv")
        if os.path.exists(imu_csv):
            raw = np.loadtxt(imu_csv, delimiter=",", comments="#")
            imu = ImuData(
                t=raw[:, 0] * 1e-9, gyr=raw[:, 1:4], acc=raw[:, 4:7]
            )

    gt_t = gt_pos = None
    gt_csv = os.path.join(
        seq_dir, "mav0", "state_groundtruth_estimate0", "data.csv"
    )
    if os.path.exists(gt_csv):
        raw = np.loadtxt(gt_csv, delimiter=",", comments="#")
        gt_t = raw[:, 0] * 1e-9
        gt_pos = raw[:, 1:4]

    return Sequence(ts, left, right, imu, gt_t, gt_pos)


def load_tum_vi(seq_dir: str, stereo: bool = True, with_imu: bool = True) -> Sequence:
    """TUM-VI uses the same mav0/ layout as EuRoC."""
    return load_euroc(seq_dir, stereo=stereo, with_imu=with_imu)


def _read_tum_list(path):
    """Parse a TUM-RGBD index file (``timestamp filename`` per line)."""
    ts, files = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.strip().split()
            ts.append(float(parts[0]))
            files.append(parts[1])
    return np.asarray(ts), files


def associate(t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02):
    """Timestamp association (reference ``evaluation/associate.py``):
    greedy nearest-neighbour pairing within ``max_dt``.  Returns
    (idx_a, idx_b) of matched rows."""
    ia, ib = [], []
    j = 0
    used = np.zeros(len(t_b), bool)
    for i, ta in enumerate(t_a):
        j = int(np.searchsorted(t_b, ta))
        best, bd = -1, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(t_b) and not used[k]:
                d = abs(t_b[k] - ta)
                if d < bd:
                    best, bd = k, d
        if best >= 0:
            used[best] = True
            ia.append(i)
            ib.append(best)
    return np.asarray(ia, int), np.asarray(ib, int)


def load_tum_rgbd(seq_dir: str, depth_factor: float = 5000.0) -> Sequence:
    """TUM-RGBD layout: rgb.txt / depth.txt / groundtruth.txt
    (reference `Examples/RGB-D/rgbd_tum.cc` + ``associate.py``: rgb and
    depth streams are unsynchronized and must be timestamp-associated)."""
    t_rgb, rgb_files = _read_tum_list(os.path.join(seq_dir, "rgb.txt"))
    t_d, d_files = _read_tum_list(os.path.join(seq_dir, "depth.txt"))
    ia, ib = associate(t_rgb, t_d)
    ts = t_rgb[ia]
    left = [os.path.join(seq_dir, rgb_files[i]) for i in ia]
    depth = [os.path.join(seq_dir, d_files[i]) for i in ib]

    gt_t = gt_pos = None
    gt_file = os.path.join(seq_dir, "groundtruth.txt")
    if os.path.exists(gt_file):
        raw = np.loadtxt(gt_file, comments="#")
        gt_t = raw[:, 0]
        gt_pos = raw[:, 1:4]
    return Sequence(
        ts, left, None, None, gt_t, gt_pos,
        depth_paths=depth, depth_factor=depth_factor,
    )


def load_kitti(seq_dir: str, stereo: bool = True) -> Sequence:
    """KITTI odometry layout: image_0/, image_1/, times.txt."""
    times = np.loadtxt(os.path.join(seq_dir, "times.txt"))
    left_dir = os.path.join(seq_dir, "image_0")
    left = [
        os.path.join(left_dir, f) for f in sorted(os.listdir(left_dir))
        if f.endswith(".png")
    ]
    right = None
    if stereo:
        right_dir = os.path.join(seq_dir, "image_1")
        if os.path.isdir(right_dir):
            right = [
                os.path.join(right_dir, f) for f in sorted(os.listdir(right_dir))
                if f.endswith(".png")
            ]
    return Sequence(times, left, right)


def make_rectify_maps(rect: dict, size_hw=None):
    """cv2 rectification maps from LEFT/RIGHT blocks (yaml_compat).

    Mirrors the stereo example drivers' ``initUndistortRectifyMap`` usage.
    Returns ((map1x, map1y), (map2x, map2y)).
    """
    import cv2

    out = []
    for side in ("LEFT", "RIGHT"):
        blk = rect[side]
        h = size_hw[0] if size_hw else blk["height"]
        w = size_hw[1] if size_hw else blk["width"]
        m1, m2 = cv2.initUndistortRectifyMap(
            blk["K"], blk["D"], blk["R"], blk["P"][:3, :3], (w, h), cv2.CV_32F
        )
        out.append((m1, m2))
    return out


def rectify(img: np.ndarray, maps) -> np.ndarray:
    import cv2

    return cv2.remap(img, maps[0], maps[1], cv2.INTER_LINEAR)
