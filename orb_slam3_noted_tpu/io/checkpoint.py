"""Map checkpoint / resume (device arrays -> host -> disk).

The reference only scaffolds this — ``System::SaveMap/LoadMap`` are TODO
comments (`/root/reference/include/System.h:159-161`) with unused
boost::serialization hooks on IMU types and camera models.  Here it is a
first-class feature (SURVEY §5): the whole SLAM state is a pytree of arrays
plus a handful of host scalars, so a checkpoint is a single compressed npz.

Saved state:
- every :class:`~orb_slam3_noted_tpu.pipeline.map_state.MapArrays` field,
- the per-keyframe inertial table (velocities/biases) when present,
- host counters (keyframe/point allocators, tracking state, stage flags),
- the trajectory so far,
- the config (as a dict) for shape validation at load time.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.pipeline.map_state import MapArrays

_FORMAT_VERSION = 1


def _config_dict(cfg):
    d = dataclasses.asdict(cfg)
    cam = d.pop("camera")
    d["camera_kind"] = cam["kind"]
    d["camera_params"] = list(cam["params"])
    return d


def save_map(path: str, slam) -> None:
    """Checkpoint a SLAM system (Mono/Stereo/RGBD/inertial) to ``path``."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in slam.m._asdict().items()}
    host = {
        "n_kf": slam.n_kf,
        "n_mp": slam.n_mp,
        "state": slam.state,
        "last_kf_slot": slam.last_kf_slot,
        "frames_since_kf": slam.frames_since_kf,
        "tracked_at_kf": slam.tracked_at_kf,
    }
    arrays["last_Rcw"] = np.asarray(slam.last_Rcw)
    arrays["last_tcw"] = np.asarray(slam.last_tcw)
    if getattr(slam, "ki", None) is not None:
        arrays["ki_vel"] = np.asarray(slam.ki.vel)
        arrays["ki_bg"] = np.asarray(slam.ki.bg)
        arrays["ki_ba"] = np.asarray(slam.ki.ba)
        host["imu_stage"] = slam.imu_stage
        host["kf_order"] = list(map(int, slam.kf_order))
        host["kf_times"] = list(map(float, slam.kf_times))
        arrays["bias_bg"] = np.asarray(slam.bias.bg)
        arrays["bias_ba"] = np.asarray(slam.bias.ba)
    traj = np.asarray(
        [
            np.concatenate([
                [r.frame_id], r.Rcw.reshape(-1), r.tcw.reshape(-1),
                [float(r.n_inliers)],
            ])
            for r in slam.trajectory
        ]
        if slam.trajectory else np.zeros((0, 14))
    )
    traj_states = [r.state for r in slam.trajectory]
    np.savez_compressed(
        path,
        __version__=_FORMAT_VERSION,
        __host__=json.dumps(host),
        __config__=json.dumps(_config_dict(slam.cfg)),
        __traj_states__=json.dumps(traj_states),
        traj=traj,
        **arrays,
    )


def load_map(path: str, slam) -> None:
    """Restore a checkpoint into a freshly constructed SLAM system.

    The system must be constructed with a config whose shapes match the
    checkpoint (validated here).
    """
    from orb_slam3_noted_tpu.imu.preintegration import Bias
    from orb_slam3_noted_tpu.pipeline.inertial_mapping import KFInertial
    from orb_slam3_noted_tpu.pipeline.system import FrameRecord

    z = np.load(path, allow_pickle=False)
    ver = int(z["__version__"])
    if ver != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {ver} != {_FORMAT_VERSION}")
    saved_cfg = json.loads(str(z["__config__"]))
    for key in ("max_keyframes", "max_map_points", "n_features"):
        have = getattr(slam.cfg, key)
        want = saved_cfg[key]
        if have != want:
            raise ValueError(
                f"config mismatch on {key}: checkpoint {want}, system {have}"
            )
    fields = {}
    for k in MapArrays._fields:
        if f"map_{k}" in z:
            fields[k] = jnp.asarray(z[f"map_{k}"])
        elif k == "kf_xy_r":
            # field added in round 3; older checkpoints carry no
            # second-camera observations
            fields[k] = jnp.full_like(jnp.asarray(z["map_kf_xy"]), -1.0)
        elif k == "kf_parent":
            # spanning tree added in round 4; older checkpoints fall back
            # to roots (pose-graph edges then come from covisibility only)
            KF = z["map_kf_valid"].shape[0]
            fields[k] = jnp.full(KF, -1, jnp.int32)
        else:
            raise KeyError(f"checkpoint missing map field {k}")
    slam.m = MapArrays(**fields)
    host = json.loads(str(z["__host__"]))
    slam.n_kf = int(host["n_kf"])
    slam.n_mp = int(host["n_mp"])
    slam.state = host["state"]
    slam.last_kf_slot = int(host["last_kf_slot"])
    slam.frames_since_kf = int(host["frames_since_kf"])
    slam.tracked_at_kf = int(host["tracked_at_kf"])
    slam.last_Rcw = jnp.asarray(z["last_Rcw"])
    slam.last_tcw = jnp.asarray(z["last_tcw"])
    slam.vel = None
    if "ki_vel" in z and getattr(slam, "ki", None) is not None:
        slam.ki = KFInertial(
            vel=jnp.asarray(z["ki_vel"]),
            bg=jnp.asarray(z["ki_bg"]),
            ba=jnp.asarray(z["ki_ba"]),
        )
        slam.imu_stage = int(host["imu_stage"])
        slam.kf_order = list(host["kf_order"])
        slam.kf_times = list(host["kf_times"])
        slam.bias = Bias(jnp.asarray(z["bias_bg"]), jnp.asarray(z["bias_ba"]))
    traj = z["traj"]
    states = json.loads(str(z["__traj_states__"]))
    slam.trajectory = [
        FrameRecord(
            frame_id=int(row[0]),
            Rcw=row[1:10].reshape(3, 3),
            tcw=row[10:13],
            state=states[i],
            n_inliers=int(row[13]),
        )
        for i, row in enumerate(traj)
    ]
