"""Inertial mapping steps over the device map: Local/Full inertial BA.

Harnesses connecting :mod:`orb_slam3_noted_tpu.optim.inertial_ba` to the
fixed-capacity :class:`~orb_slam3_noted_tpu.pipeline.map_state.MapArrays`:

- :func:`local_inertial_ba` — ``Optimizer::LocalInertialBA``
  (`/root/reference/src/Optimizer.cc:3900`): temporal window of the last Nd
  keyframes (the reference uses 10, 25 for stereo) with the window's oldest
  entry fixed as anchor, inertial chain edges between consecutive window
  keyframes, reprojection factors of every map point observed in the window.
- :func:`full_inertial_ba` — ``Optimizer::FullInertialBA``
  (`src/Optimizer.cc:391`): all keyframes, first fixed, optional bias priors
  (used right after IMU initialization with prior strength from the staged
  schedule `src/LocalMapping.cc:187-236`).

Both take the temporal chain as stacked preintegrations + a slot list, keep
all shapes static (windows padded, masks everywhere), and write results back
into the map plus the per-keyframe inertial state table.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.imu.preintegration import Calib, Preintegrated
from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models import cameras as cam_mod
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.optim.inertial_ba import (
    VIBAProblem,
    no_prior,
    visual_inertial_ba,
)
from orb_slam3_noted_tpu.optim.vi_factors import (
    InertialEdges,
    VIState,
    body_from_cam,
    cam_from_body,
)
from orb_slam3_noted_tpu.pipeline import map_state as MS


class KFInertial(NamedTuple):
    """Per-keyframe inertial state table (parallel to MapArrays KF slots)."""

    vel: jnp.ndarray  # (KF, 3)
    bg: jnp.ndarray   # (KF, 3)
    ba: jnp.ndarray   # (KF, 3)


def empty_inertial(cfg: SlamConfig, dtype=jnp.float32) -> KFInertial:
    KF = cfg.max_keyframes
    return KFInertial(
        vel=jnp.zeros((KF, 3), dtype),
        bg=jnp.zeros((KF, 3), dtype),
        ba=jnp.zeros((KF, 3), dtype),
    )


def _window_obs(m: MS.MapArrays, kf_slots, kf_mask, cfg):
    """Reprojection table over the window keyframes' feature bindings."""
    NF = m.kf_xy.shape[1]
    MP = m.mp_pos.shape[0]
    K = kf_slots.shape[0]
    k_local = jnp.repeat(jnp.arange(K, dtype=jnp.int32), NF)
    f_idx = jnp.tile(jnp.arange(NF, dtype=jnp.int32), K)
    kf_g = kf_slots[k_local]
    mp_id = m.kf_mp[kf_g, f_idx]
    valid = kf_mask[k_local] & (mp_id >= 0) & m.kf_feat_valid[kf_g, f_idx]
    mp_idx = jnp.clip(mp_id, 0)
    valid = valid & m.mp_valid[mp_idx]
    sigma2 = jnp.asarray(cfg.level_sigma2, m.mp_pos.dtype)
    uvr = m.kf_uvr[kf_g, f_idx]
    # second-camera pixels (non-rectified fisheye stereo): stored per
    # keyframe feature in kf_xy_r, -1 = no right observation
    uv2 = m.kf_xy_r[kf_g, f_idx]
    obs = factors.ReprojObs(
        pose_idx=k_local,
        point_idx=mp_idx,
        uv=m.kf_xy[kf_g, f_idx],
        uv_r=uvr,
        inv_sigma2=1.0 / sigma2[m.kf_level[kf_g, f_idx]],
        is_stereo=uvr >= 0,
        valid=valid,
        uv2=uv2,
        is_right=valid & (uv2[:, 0] >= 0),
    )
    seen = jnp.zeros(MP, bool).at[mp_idx].max(valid)
    return obs, seen, (kf_g, f_idx)


@partial(jax.jit, static_argnames=("cam", "cfg", "bf", "n_iters",
                                   "bias_prior_g", "bias_prior_a",
                                   "fix_all_but_last"))
def chain_inertial_ba(
    m: MS.MapArrays,
    ki: KFInertial,
    kf_slots: jnp.ndarray,     # (K,) temporal chain, oldest first
    kf_mask: jnp.ndarray,      # (K,) bool real entries
    preints: Preintegrated,    # stacked (K-1,) between consecutive entries
    seg_valid: jnp.ndarray,    # (K-1,) bool
    cam: cam_mod.Camera,
    calib: Calib,
    cfg: SlamConfig,
    bf: float = 0.0,
    n_iters: int = 4,
    bias_prior_g: float = 0.0,
    bias_prior_a: float = 0.0,
    fix_all_but_last: bool = False,
):
    """Visual-inertial BA over a temporal keyframe chain (padded, static).

    Covers both LocalInertialBA (pass the window = last Nd slots; the oldest
    real entry is fixed) and FullInertialBA (pass all slots; bias priors on).
    Returns (m, ki) updated.
    """
    K = kf_slots.shape[0]
    dtype = m.mp_pos.dtype

    Rcw = m.kf_Rcw[kf_slots]
    tcw = m.kf_tcw[kf_slots]
    Rwb, twb = body_from_cam(Rcw, tcw, calib)
    idxs = jnp.where(kf_mask, kf_slots, 0)
    st0 = VIState(
        Rwb=Rwb, twb=twb,
        vel=ki.vel[idxs], bg=ki.bg[idxs], ba=ki.ba[idxs],
    )
    obs, seen, obs_meta = _window_obs(m, kf_slots, kf_mask, cfg)
    edges = InertialEdges(
        i=jnp.arange(K - 1, dtype=jnp.int32),
        j=jnp.arange(1, K, dtype=jnp.int32),
        preint=preints,
        valid=seg_valid & kf_mask[:-1] & kf_mask[1:],
    )
    # gauge: oldest real entry fixed; padded entries fixed
    first_real = jnp.argmax(kf_mask)
    pose_fixed = ~kf_mask
    pose_fixed = pose_fixed.at[first_real].set(True)
    if fix_all_but_last:
        pose_fixed = pose_fixed | (
            jnp.arange(K) < (K - 1)
        )
    # compact the landmark table to the window's seen points: the solver's
    # per-iteration landmark marginalization is linear in the point-table
    # size, and the full 16k-capacity table was ~4x wasted work for an
    # 8-keyframe window (round-4 VI profile)
    MP = m.mp_pos.shape[0]
    MPC = min(K * m.kf_xy.shape[1] // 2, MP)
    # "no silent caps": landmarks beyond the compaction budget are dropped
    # from this BA — count them (visible via --times) instead of silence
    from orb_slam3_noted_tpu.utils.timing import report_saturation

    report_saturation(
        "chain_ba_landmarks",
        jnp.maximum(jnp.sum(seen.astype(jnp.int32)) - MPC, 0),
    )
    sel = jnp.argsort(~seen)[:MPC]
    inv = jnp.zeros(MP, jnp.int32).at[sel].set(
        jnp.arange(MPC, dtype=jnp.int32)
    )
    seen_c = seen[sel]
    obs = obs._replace(
        point_idx=inv[obs.point_idx],
        valid=obs.valid & seen[obs.point_idx],
    )
    prob = VIBAProblem(
        state=st0, points=m.mp_pos[sel], obs=obs, edges=edges,
        pose_fixed=pose_fixed, point_fixed=~seen_c,
        prior=no_prior(dtype),
    )
    from orb_slam3_noted_tpu.pipeline.tracking import _second_camera

    cam2, Rrl, trl = _second_camera(cfg)
    res = visual_inertial_ba(
        cam, calib, prob, bf=bf, n_iters=n_iters, n_iters_final=n_iters,
        huber_inertial=True,
        bias_prior_g=bias_prior_g, bias_prior_a=bias_prior_a,
        cam2=cam2, Rrl=Rrl, trl=trl,
    )
    st = res.state
    Rcw_n, tcw_n = cam_from_body(st, calib)
    m = MS.apply_ba_result(
        m, kf_slots, kf_mask, Rcw_n, tcw_n,
        sel, seen_c, res.points,
    )
    # unbind outlier observations + rebuild window obs_mat rows.
    # All scatters use masked-delta .add so padded window entries (which may
    # alias a real slot) contribute exactly zero.
    kf_g, f_idx = obs_meta
    out = obs.valid & ~res.inlier  # obs.valid already includes kf_mask
    old_bind = m.kf_mp[kf_g, f_idx]
    m = m._replace(
        kf_mp=m.kf_mp.at[kf_g, f_idx].add(
            jnp.where(out, -1 - old_bind, 0)
        )
    )
    NF = m.kf_xy.shape[1]
    k_local = jnp.repeat(jnp.arange(K, dtype=jnp.int32), NF)
    new_bind = m.kf_mp[kf_g, f_idx]
    rows = jnp.zeros((K, MP), bool).at[k_local, jnp.clip(new_bind, 0)].max(
        (new_bind >= 0) & kf_mask[k_local]
    )
    rows_full = jnp.zeros_like(m.obs_mat).at[kf_slots].max(
        rows & kf_mask[:, None]
    )
    mask_full = jnp.zeros(m.obs_mat.shape[0], bool).at[kf_slots].max(kf_mask)
    m = m._replace(
        obs_mat=jnp.where(mask_full[:, None], rows_full, m.obs_mat)
    )
    mk = kf_mask[:, None]
    ki = KFInertial(
        vel=ki.vel.at[kf_slots].add(jnp.where(mk, st.vel - ki.vel[kf_slots], 0.0)),
        bg=ki.bg.at[kf_slots].add(jnp.where(mk, st.bg - ki.bg[kf_slots], 0.0)),
        ba=ki.ba.at[kf_slots].add(jnp.where(mk, st.ba - ki.ba[kf_slots], 0.0)),
    )
    return m, ki
