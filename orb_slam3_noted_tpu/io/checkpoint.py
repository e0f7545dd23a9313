"""Map checkpoint / resume (device arrays -> host -> disk).

The reference only scaffolds this — ``System::SaveMap/LoadMap`` are TODO
comments (`/root/reference/include/System.h:159-161`) with unused
boost::serialization hooks on IMU types and camera models.  Here it is a
first-class feature (SURVEY §5): the whole SLAM state is a pytree of arrays
plus a handful of host scalars, so a checkpoint is a single compressed npz.

Saved state (format v2):
- every :class:`~orb_slam3_noted_tpu.pipeline.map_state.MapArrays` field,
- the per-keyframe inertial table (velocities/biases) when present,
- the RAW temporal-chain IMU segments (``kf_segments``/``seg_ok``) so a
  resumed inertial run re-integrates and keeps its inertial factors — a
  round-4 checkpoint silently resumed visual-only,
- the place-recognition database (vocabulary + BoW rows + idf) so loops
  and relocalization can close against pre-checkpoint keyframes,
- host counters (keyframe/point allocators, recycling free-list, tracking
  state, stage flags), the trajectory so far, and the config for shape
  validation at load time.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.pipeline.map_state import MapArrays

_FORMAT_VERSION = 2


def _config_dict(cfg):
    d = dataclasses.asdict(cfg)
    cam = d.pop("camera")
    d["camera_kind"] = cam["kind"]
    d["camera_params"] = list(cam["params"])
    cam2 = d.pop("camera2", None)
    if cam2 is not None:
        d["camera2_kind"] = cam2["kind"]
        d["camera2_params"] = list(cam2["params"])
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
        "kf_inserted": getattr(slam, "kf_inserted", 0),
        "free_kf_slots": list(map(int, getattr(slam, "free_kf_slots", []))),
    }
    arrays["last_Rcw"] = np.asarray(slam.last_Rcw)
    arrays["last_tcw"] = np.asarray(slam.last_tcw)
    arrays["kf_frame_ids"] = np.asarray(
        getattr(slam, "kf_frame_ids", np.zeros(0, np.int64))
    )
    if getattr(slam, "ki", None) is not None:
        arrays["ki_vel"] = np.asarray(slam.ki.vel)
        arrays["ki_bg"] = np.asarray(slam.ki.bg)
        arrays["ki_ba"] = np.asarray(slam.ki.ba)
        host["imu_stage"] = slam.imu_stage
        host["kf_order"] = list(map(int, slam.kf_order))
        host["kf_times"] = list(map(float, slam.kf_times))
        host["seg_ok"] = list(map(bool, slam.seg_ok))
        host["last_t"] = (
            float(slam.last_t) if slam.last_t is not None else None
        )
        arrays["bias_bg"] = np.asarray(slam.bias.bg)
        arrays["bias_ba"] = np.asarray(slam.bias.ba)
        arrays["cur_vel"] = np.asarray(slam.cur_vel)
        # raw chain segments, concatenated with per-segment lengths (the
        # data ``Preintegrated`` keeps for Reintegrate — a resume must be
        # able to re-scan with a new bias)
        if slam.kf_segments:
            arrays["seg_acc"] = np.concatenate(
                [s[0] for s in slam.kf_segments]
            ).astype(np.float32)
            arrays["seg_gyr"] = np.concatenate(
                [s[1] for s in slam.kf_segments]
            ).astype(np.float32)
            arrays["seg_dt"] = np.concatenate(
                [s[2] for s in slam.kf_segments]
            ).astype(np.float32)
            arrays["seg_len"] = np.asarray(
                [len(s[2]) for s in slam.kf_segments], np.int64
            )
        else:
            arrays["seg_acc"] = np.zeros((0, 3), np.float32)
            arrays["seg_gyr"] = np.zeros((0, 3), np.float32)
            arrays["seg_dt"] = np.zeros((0,), np.float32)
            arrays["seg_len"] = np.zeros((0,), np.int64)
    # place-recognition database (loop closer's, or the standalone reloc
    # DB) — vocabulary + occupied BoW rows + idf
    db = None
    db_kind = None
    if getattr(slam, "loop_closer", None) is not None:
        db = slam.loop_closer.db
        db_kind = "loop"
        host["loop_edges"] = [
            [int(a), int(b)] for a, b in slam.loop_closer.loop_edges
        ]
    elif getattr(slam, "reloc_db", None) is not None:
        db = slam.reloc_db
        db_kind = "reloc"
    if db is not None:
        occ = np.flatnonzero(db.present)
        arrays["db_vocab"] = np.asarray(db.vocab)
        arrays["db_slots"] = occ.astype(np.int64)
        arrays["db_rows"] = np.asarray(db.bow_mat)[occ].astype(np.float32)
        if db.idf is not None:
            arrays["db_idf"] = np.asarray(db.idf)
        host["db_kind"] = db_kind
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
    if ver not in (1, _FORMAT_VERSION):
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
    slam.kf_inserted = int(host.get("kf_inserted", slam.n_kf))
    slam.free_kf_slots = list(host.get("free_kf_slots", []))
    slam.last_Rcw = jnp.asarray(z["last_Rcw"])
    slam.last_tcw = jnp.asarray(z["last_tcw"])
    if "kf_frame_ids" in z and len(z["kf_frame_ids"]):
        slam.kf_frame_ids = np.asarray(z["kf_frame_ids"])
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
        if "cur_vel" in z:
            slam.cur_vel = jnp.asarray(z["cur_vel"])
        if host.get("last_t") is not None:
            slam.last_t = float(host["last_t"])
        # rebuild raw chain segments + preintegrations (v2); a v1
        # checkpoint has none — the chain resumes visual-only until new
        # segments accrue
        if "seg_len" in z and len(z["seg_len"]):
            lens = z["seg_len"]
            offs = np.concatenate([[0], np.cumsum(lens)])
            slam.kf_segments = [
                (
                    z["seg_acc"][offs[i]: offs[i + 1]],
                    z["seg_gyr"][offs[i]: offs[i + 1]],
                    z["seg_dt"][offs[i]: offs[i + 1]],
                )
                for i in range(len(lens))
            ]
            slam.seg_ok = list(host.get("seg_ok", [True] * len(lens)))
            slam._reintegrate_segments()
        else:
            slam.kf_segments = []
            slam.seg_preints = []
            slam.seg_ok = []
    # place-recognition database
    if "db_vocab" in z and host.get("db_kind"):
        from orb_slam3_noted_tpu.place.database import KeyFrameDatabase

        idf = z["db_idf"] if "db_idf" in z else None
        db = KeyFrameDatabase(
            z["db_vocab"], slam.cfg.max_keyframes, idf=idf
        )
        occ = z["db_slots"]
        if len(occ):
            db.bow_mat = db.bow_mat.at[jnp.asarray(occ)].set(
                jnp.asarray(z["db_rows"])
            )
            db.present[occ] = True
            db.present_dev = jnp.asarray(db.present)
        if host["db_kind"] == "loop":
            from orb_slam3_noted_tpu.pipeline.loop_closing import LoopCloser

            lc = LoopCloser(
                np.asarray(z["db_vocab"]), slam.cfg.max_keyframes,
                min_inliers=slam.cfg.loop_min_inliers, idf=idf,
            )
            lc.db = db
            lc.loop_edges = [
                (int(a), int(b)) for a, b in host.get("loop_edges", [])
            ]
            slam.loop_closer = lc
        else:
            slam.reloc_db = db
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
