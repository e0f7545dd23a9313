"""Inertial multi-map: Atlas merge that carries velocities, biases and the
IMU temporal chain through the weld.

Equivalent of the reference's inertial merge path ``LoopClosing::MergeLocal2``
(`/root/reference/src/LoopClosing.cc:1648`) + ``Optimizer::MergeInertialBA``
(`src/Optimizer.cc:6048`):

- When both maps are IMU-initialized their worlds are gravity-aligned, so
  the merge transform is 4-DoF: scale fixed at 1 and the relative rotation
  projected onto yaw (rotation about the gravity axis) — a full Sim3 would
  tilt one map's gravity out of alignment.
- Per-keyframe velocity/bias tables are remapped into the merged slot space;
  velocities rotate (and scale, for a not-yet-initialized active map) with
  the world transform.
- The two IMU chains are concatenated with an explicitly INVALID junction
  segment (no IMU data spans the gap between the maps' recording intervals);
  the chain BA skips inertial factors across it (``seg_valid``).
- Welding: visual local BA (base class) followed by a windowed inertial BA
  around the junction (the MergeInertialBA analogue).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.imu.preintegration import Bias
from orb_slam3_noted_tpu.pipeline import inertial_mapping as IMAP
from orb_slam3_noted_tpu.pipeline.atlas import AtlasSLAM
from orb_slam3_noted_tpu.pipeline.inertial_system import MonoInertialSLAM


def yaw_only(R: np.ndarray) -> np.ndarray:
    """Closest rotation about +z (the gravity axis) to R."""
    yaw = np.arctan2(R[1, 0] - R[0, 1], R[0, 0] + R[1, 1])
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], R.dtype)


class InertialAtlasSLAM(AtlasSLAM):
    """Multi-map wrapper for the visual-inertial systems."""

    def __init__(self, cfg, base_cls=MonoInertialSLAM):
        super().__init__(cfg, base_cls=base_cls, fix_scale=False)

    # ------------------------------------------------------------------
    def _switch_map(self):
        a = self.active
        n_before = len(self.stored)
        super()._switch_map()
        if len(self.stored) > n_before:
            self.stored[-1].inertial = dict(
                ki=a.ki, kf_order=list(a.kf_order), kf_times=list(a.kf_times),
                kf_segments=list(a.kf_segments),
                seg_preints=list(a.seg_preints), seg_ok=list(a.seg_ok),
                imu_stage=a.imu_stage, bias=a.bias,
            )

    # ------------------------------------------------------------------
    def _try_merge(self):
        # metric maps merge with fixed scale (reference MergeLocal2 is a
        # rigid/4-DoF weld); pre-init maps still estimate it
        self.fix_scale = self.active.imu_stage >= 1
        return super()._try_merge()

    # ------------------------------------------------------------------
    def _do_merge(self, st, si, slot, cand, res):
        a = self.active
        old_inertial = st.inertial
        both_metric = (
            a.imu_stage >= 1
            and old_inertial is not None
            and old_inertial["imu_stage"] >= 1
        )
        if both_metric:
            # project the verified Sim3 onto yaw+translation, scale 1 —
            # both worlds are gravity-aligned (ApplyScaledRotation) and a
            # tilted weld would break one of them
            R = np.asarray(res.R)
            Ry = yaw_only(R)
            res = res._replace(
                R=jnp.asarray(Ry), s=jnp.asarray(1.0, res.s.dtype)
            )

        # stash chain state before the base class rewires the active system
        new_order = list(a.kf_order)
        new_times = list(a.kf_times)
        new_segments = list(a.kf_segments)
        new_preints = list(a.seg_preints)
        new_seg_ok = list(a.seg_ok)
        new_ki = a.ki
        new_stage = a.imu_stage

        # the world transform the base merge applies to the NEW map
        # (x_old = s R x_new + t) — recompute exactly as the base does
        from orb_slam3_noted_tpu.geometry import sim3

        m = a.m
        S_nc = (res.R, res.t, res.s)
        T_cur_w = (m.kf_Rcw[slot], m.kf_tcw[slot], jnp.asarray(1.0))
        T_cand_w = (st.m.kf_Rcw[cand], st.m.kf_tcw[cand], jnp.asarray(1.0))
        Rw, tw, sw = sim3.compose(
            sim3.inverse(T_cand_w), sim3.compose(sim3.inverse(S_nc), T_cur_w)
        )
        if not super()._do_merge(st, si, slot, cand, res):
            return False
        kf_off = a.last_kf_slot - slot

        # --- weld the inertial state ---
        if old_inertial is None:
            # old map had no inertial chain: keep the new chain, shifted
            a.kf_order = [kf_off + s_ for s_ in new_order]
            a.kf_times = new_times
            a.kf_segments = new_segments
            a.seg_preints = new_preints
            a.seg_ok = new_seg_ok
        else:
            a.kf_order = (
                list(old_inertial["kf_order"])
                + [kf_off + s_ for s_ in new_order]
            )
            a.kf_times = list(old_inertial["kf_times"]) + new_times
            empty = (np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0,)))
            a.kf_segments = (
                list(old_inertial["kf_segments"]) + [empty] + new_segments
            )
            junction = new_preints[0] if new_preints else (
                old_inertial["seg_preints"][0]
            )
            a.seg_preints = (
                list(old_inertial["seg_preints"]) + [junction] + new_preints
            )
            a.seg_ok = (
                list(old_inertial["seg_ok"]) + [False] + new_seg_ok
            )
        a.imu_stage = max(
            new_stage,
            old_inertial["imu_stage"] if old_inertial else 0,
        )

        # velocity/bias tables: old entries at their slots, new entries
        # shifted by kf_off with world-rotated (and scaled) velocities
        KF = a.m.kf_Rcw.shape[0]
        Rw_np = np.asarray(Rw, np.float32)
        sw_np = float(sw)
        vel = np.zeros((KF, 3), np.float32)
        bg = np.zeros((KF, 3), np.float32)
        ba = np.zeros((KF, 3), np.float32)
        if old_inertial is not None:
            ok_v = np.asarray(old_inertial["ki"].vel)
            ok_g = np.asarray(old_inertial["ki"].bg)
            ok_a = np.asarray(old_inertial["ki"].ba)
            for s_ in old_inertial["kf_order"]:
                vel[s_], bg[s_], ba[s_] = ok_v[s_], ok_g[s_], ok_a[s_]
        nv = np.asarray(new_ki.vel)
        ng = np.asarray(new_ki.bg)
        na = np.asarray(new_ki.ba)
        for s_ in new_order:
            vel[kf_off + s_] = sw_np * (Rw_np @ nv[s_])
            bg[kf_off + s_] = ng[s_]
            ba[kf_off + s_] = na[s_]
        a.ki = IMAP.KFInertial(
            vel=jnp.asarray(vel), bg=jnp.asarray(bg), ba=jnp.asarray(ba)
        )
        last = a.kf_order[-1]
        a.bias = Bias(a.ki.bg[last], a.ki.ba[last])
        a.cur_vel = a.ki.vel[last]

        # MergeInertialBA-equivalent welding around the junction
        if a.imu_stage >= 1 and len(a.kf_order) >= 3:
            a._chain_ba(window=self.cfg.inertial_window)
        return True
