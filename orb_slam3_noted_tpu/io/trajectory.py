"""Trajectory savers in the reference's output formats.

Equivalents of ``System::SaveTrajectory{TUM,EuRoC,KITTI}`` and the keyframe
variants (`/root/reference/src/System.cc:421-714`):

- TUM:   ``t tx ty tz qx qy qz qw`` per line (camera-to-world)
- EuRoC: same fields, timestamp in ns
- KITTI: 12 numbers per line, the 3x4 camera-to-world matrix row-major
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3


def _twc_quat(Rcw: np.ndarray, tcw: np.ndarray):
    Rwc = Rcw.T
    twc = -Rwc @ tcw
    q = np.asarray(so3.to_quat(jnp.asarray(Rwc)))  # (w, x, y, z)
    return Rwc, twc, q


def _stamp(rec):
    """Timestamp of a record; frame_id stands in when none is stored."""
    t = getattr(rec, "timestamp", None)
    return t if t is not None else rec.frame_id


def save_tum(path: str, records):
    """records: iterable of FrameRecord (frame_id used as timestamp if no
    timestamps attribute)."""
    with open(path, "w") as f:
        for rec in records:
            t = _stamp(rec)
            _, twc, q = _twc_quat(rec.Rcw, rec.tcw)
            f.write(
                f"{t:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def save_euroc(path: str, records):
    with open(path, "w") as f:
        for rec in records:
            t = _stamp(rec)
            _, twc, q = _twc_quat(rec.Rcw, rec.tcw)
            f.write(
                f"{int(t*1e9)} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def save_kitti(path: str, records):
    with open(path, "w") as f:
        for rec in records:
            Rwc, twc, _ = _twc_quat(rec.Rcw, rec.tcw)
            M = np.concatenate([Rwc, twc[:, None]], axis=1).reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in M) + "\n")


def save_keyframes_tum(path: str, slam, stamps=None):
    """Keyframe-only trajectory (reference ``SaveKeyFrameTrajectoryTUM``,
    `/root/reference/src/System.cc:560`): one line per VALID keyframe in
    frame-id order, with each keyframe's FINAL (BA/loop-refined) pose.

    ``stamps``: optional frame-id -> seconds mapping (array/list); frame id
    is used directly when absent.
    """
    m = slam.m
    kf_valid = np.asarray(m.kf_valid)
    fids = np.asarray(m.kf_frame_id)
    Rcw = np.asarray(m.kf_Rcw)
    tcw = np.asarray(m.kf_tcw)
    slots = np.flatnonzero(kf_valid)
    slots = slots[np.argsort(fids[slots])]
    with open(path, "w") as f:
        for s in slots:
            t = fids[s]
            if stamps is not None and 0 <= t < len(stamps):
                t = stamps[int(t)]
            _, twc, q = _twc_quat(Rcw[s], tcw[s])
            f.write(
                f"{float(t):.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )
    return path


def load_tum(path: str):
    """-> (t (N,), pos (N, 3), quat_wxyz (N, 4))."""
    raw = np.loadtxt(path)
    t = raw[:, 0]
    pos = raw[:, 1:4]
    q = raw[:, [7, 4, 5, 6]]  # file is qx qy qz qw -> reorder to wxyz
    return t, pos, q
