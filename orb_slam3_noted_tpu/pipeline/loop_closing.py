"""Loop detection and correction.

Functional equivalent of the reference's LoopClosing thread
(`/root/reference/src/LoopClosing.cc`): BoW candidate retrieval
(``NewDetectCommonRegions``/``DetectNBestCandidates``), Sim3 geometric
verification (``DetectCommonRegionsFromBoW`` + Sim3Solver), and loop
correction (``CorrectLoop``): propagate the corrected Sim3 through the
keyframe graph with a pose-graph optimization and re-anchor map points via
their reference keyframes.  Runs synchronously after keyframe insertion
(the async pipelined version is a later phase); GBA after correction is
optional.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import sim3
from orb_slam3_noted_tpu.geometry.sim3_solver import sim3_ransac
from orb_slam3_noted_tpu.ops import matching as M
from orb_slam3_noted_tpu.optim.pose_graph import Sim3Edges, optimize_pose_graph_sim3
from orb_slam3_noted_tpu.place.database import KeyFrameDatabase

_HP = jax.lax.Precision.HIGHEST


@jax.jit
def _matched_point_pairs(m, slot_cur, slot_cand):
    """3D-3D pairs from descriptor matches between two keyframes' map points.

    Points are expressed in each keyframe's own camera frame (as the
    reference's Sim3Solver does). Returns (x_cand, x_cur, valid) of length NF.
    """
    d = M.hamming_matrix(m.kf_desc[slot_cur], m.kf_desc[slot_cand])
    has_mp_cur = m.kf_mp[slot_cur] >= 0
    has_mp_cand = m.kf_mp[slot_cand] >= 0
    gate = (
        has_mp_cur[:, None]
        & has_mp_cand[None, :]
        & m.kf_feat_valid[slot_cur][:, None]
        & m.kf_feat_valid[slot_cand][None, :]
    )
    masked = jnp.where(gate, d, M.BIG)
    best = jnp.min(masked, axis=1)
    idx = jnp.argmin(masked, axis=1)
    # mutual + absolute threshold
    best_back = jnp.argmin(masked, axis=0)
    ok = (best <= M.TH_LOW) & (best_back[idx] == jnp.arange(d.shape[0]))

    mp_cur = jnp.clip(m.kf_mp[slot_cur], 0)
    mp_cand = jnp.clip(m.kf_mp[slot_cand][idx], 0)
    Xw_cur = m.mp_pos[mp_cur]
    Xw_cand = m.mp_pos[mp_cand]
    x_cur = jnp.einsum("ij,nj->ni", m.kf_Rcw[slot_cur], Xw_cur, precision=_HP) + m.kf_tcw[slot_cur]
    x_cand = (
        jnp.einsum("ij,nj->ni", m.kf_Rcw[slot_cand], Xw_cand, precision=_HP)
        + m.kf_tcw[slot_cand]
    )
    ok = ok & m.mp_valid[mp_cur] & m.mp_valid[mp_cand]
    return x_cand, x_cur, ok


@jax.jit
def _apply_correction(m, R_new, t_new, s_new):
    """Write corrected Sim3 keyframe poses and re-anchor map points.

    KF pose: Tcw = [R | t/s] (the reference's convention after essential
    graph optimization).  Map points: x_new = S_new_ref^{-1}(S_old_ref(x)),
    via each point's reference keyframe (reference ``CorrectLoop``
    `src/LoopClosing.cc:941-1014`).
    """
    ref = m.mp_ref_kf
    R_old = m.kf_Rcw[ref]
    t_old = m.kf_tcw[ref]
    # old poses are SE3 (s=1)
    x_ref = jnp.einsum("nij,nj->ni", R_old, m.mp_pos, precision=_HP) + t_old
    # invert new Sim3: x_w = (1/s) R^T (x_ref - t)
    Rn = R_new[ref]
    tn = t_new[ref]
    sn = s_new[ref]
    x_new = jnp.einsum("nji,nj->ni", Rn, x_ref - tn, precision=_HP) / sn[:, None]
    mp_pos = jnp.where(m.mp_valid[:, None], x_new, m.mp_pos)
    kf_tcw_new = t_new / s_new[:, None]
    return m._replace(
        kf_Rcw=jnp.where(m.kf_valid[:, None, None], R_new, m.kf_Rcw),
        kf_tcw=jnp.where(m.kf_valid[:, None], kf_tcw_new, m.kf_tcw),
        mp_pos=mp_pos,
    )


class LoopCloser:
    """Host-side loop-closing stage over the shared map snapshot."""

    def __init__(
        self,
        vocab: np.ndarray,
        max_keyframes: int,
        min_inliers: int = 25,
        covis_edge_weight: int = 30,
        exclude_recent: int = 10,
        enable_gba: bool = True,
        consistency_th: int = 3,
    ):
        self.db = KeyFrameDatabase(vocab, max_keyframes)
        self.min_inliers = min_inliers
        self.covis_edge_weight = covis_edge_weight
        self.exclude_recent = exclude_recent
        self.enable_gba = enable_gba
        # required consecutive covisibility-consistent detections before a
        # candidate may correct the map (reference
        # ``mnCovisibilityConsistencyTh = 3``, 3-hit temporal consistency of
        # `src/LoopClosing.cc:356-439`)
        self.consistency_th = consistency_th
        self.consistent_groups: list[tuple[set, int]] = []
        self.loops_closed = 0
        self.last_loop_kf = -1

    # ------------------------------------------------------------------
    def on_keyframe(self, slam, slot: int):
        """Detect + correct a loop for the newly inserted keyframe `slot`.

        slam: the SLAM system (provides .m map arrays, .n_kf). Returns True
        if a loop was closed (slam.m replaced with the corrected snapshot).
        """
        m = slam.m
        word, bow = self.db.compute_bow(
            m.kf_desc[slot], m.kf_feat_valid[slot]
        )
        # exclusion: covisible KFs + recent window (reference excludes
        # covisibles and requires temporal gap; src/KeyFrameDatabase.cc:611).
        # The covisibility matrix stays on device (one MXU matmul); only the
        # small (KF, KF) result is pulled for the host-side consistency sets.
        from orb_slam3_noted_tpu.pipeline import map_state as MS

        covis_dev = MS.covisibility_matrix(m)
        covis_mat = np.asarray(covis_dev)
        exclude = covis_mat[slot] > 0
        # recency on FRAME ids, not slot order (robust to slot recycling;
        # the reference's exclusion is by mnId gap)
        fids = np.asarray(m.kf_frame_id)
        kf_valid = np.asarray(m.kf_valid)
        recent_fids = np.sort(fids[kf_valid])[-(self.exclude_recent + 1):]
        min_recent = recent_fids[0] if len(recent_fids) else 0
        exclude |= kf_valid & (fids >= min_recent)
        exclude[slot] = True
        slots, scores = self.db.detect_candidates(
            bow, exclude, n_best=3, covis=covis_dev
        )
        self.db.add(slot, bow)
        if not slots:
            self.consistent_groups = []
            return False

        # --- temporal consistency: a candidate place must be re-detected in
        # `consistency_th` consecutive keyframes (groups linked by
        # covisibility), before geometric verification is allowed ---
        new_groups: list[tuple[set, int]] = []
        verified_cands: list[int] = []
        for cand in slots:
            grp = set(np.flatnonzero(covis_mat[cand] > 0).tolist()) | {cand}
            count = 0
            for prev_grp, prev_count in self.consistent_groups:
                if grp & prev_grp:
                    count = max(count, prev_count + 1)
            new_groups.append((grp, count))
            # count = prev_chain + 1 on a re-detection, 0 on first sight;
            # accept once the chain length reaches the threshold — matches
            # the reference accumulation exactly (nCurrentConsistency starts
            # at 0 on first sight; `src/LoopClosing.cc:400-430`)
            if count >= self.consistency_th:
                verified_cands.append(cand)
        self.consistent_groups = new_groups
        if not verified_cands:
            return False

        for cand in verified_cands:
            x_cand, x_cur, ok = _matched_point_pairs(
                m, jnp.int32(slot), jnp.int32(cand)
            )
            if int(jnp.sum(ok)) < self.min_inliers:
                continue
            res = sim3_ransac(
                x_cand, x_cur, ok, jax.random.PRNGKey(slot),
                fix_scale=False,
            )
            if not bool(res.success) or int(res.n_inliers) < self.min_inliers:
                continue
            self._correct(slam, slot, cand, res, covis=covis_mat)
            self.loops_closed += 1
            self.last_loop_kf = slot
            self.consistent_groups = []
            return True
        return False

    # ------------------------------------------------------------------
    def _correct(self, slam, slot: int, cand: int, res, covis=None):
        m = slam.m
        KF = m.kf_Rcw.shape[0]
        kf_valid = np.asarray(m.kf_valid)
        n_kf = slam.n_kf

        # --- build edge list (numpy host side; covis computed on device) ---
        if covis is None:
            from orb_slam3_noted_tpu.pipeline import map_state as MS

            covis = np.asarray(MS.covisibility_matrix(m))
        ei, ej = [], []
        # sequential chain (spanning-tree stand-in)
        for k in range(n_kf - 1):
            if kf_valid[k] and kf_valid[k + 1]:
                ei.append(k); ej.append(k + 1)
        # covisibility edges above threshold
        ii, jj = np.nonzero(np.triu(covis, 2) >= self.covis_edge_weight)
        for a, b in zip(ii, jj):
            if kf_valid[a] and kf_valid[b] and a < n_kf and b < n_kf:
                ei.append(int(a)); ej.append(int(b))
        n_real = len(ei)

        # measurements from CURRENT (drifted) estimates: S_ji = T_j * T_i^-1
        R_all = m.kf_Rcw
        t_all = m.kf_tcw
        s_all = jnp.ones(KF, m.kf_tcw.dtype)
        i_arr = jnp.asarray(ei + [cand], jnp.int32)
        j_arr = jnp.asarray(ej + [slot], jnp.int32)

        Si = (R_all[i_arr[:-1]], t_all[i_arr[:-1]], s_all[i_arr[:-1]])
        Sj = (R_all[j_arr[:-1]], t_all[j_arr[:-1]], s_all[j_arr[:-1]])
        Rr, tr, sr = jax.vmap(lambda a, b: sim3.compose(b, sim3.inverse(a)))(Si, Sj)

        # loop edge: S_cur_cand from the Sim3 solver (maps candidate-frame
        # points into the current frame): S_cur_w_corrected = S_loop o T_cand_w
        eR = jnp.concatenate([Rr, res.R[None]])
        et = jnp.concatenate([tr, res.t[None]])
        es = jnp.concatenate([sr, res.s[None]])
        weight = jnp.ones(n_real + 1, jnp.float32).at[-1].set(float(n_real) / 4 + 1.0)
        edges = Sim3Edges(
            i=i_arr, j=j_arr, R=eR, t=et, s=es,
            weight=weight,
            valid=jnp.ones(n_real + 1, bool),
        )
        fixed = jnp.zeros(KF, bool).at[cand].set(True)
        # freeze invalid slots too (no edges touch them, but keep H regular)
        fixed = fixed | ~jnp.asarray(kf_valid)

        R_new, t_new, s_new, cost = optimize_pose_graph_sim3(
            R_all, t_all, s_all, edges, fixed
        )
        slam.m = _apply_correction(m, R_new, t_new, s_new)

        # SearchAndFuse (`src/LoopClosing.cc:1872`): with poses corrected,
        # project the map into the loop-side keyframes and merge the
        # duplicate landmarks the drift created (the current window's points
        # now land on the loop side's features and vice versa)
        if getattr(slam, "cfg", None) is not None:
            from orb_slam3_noted_tpu.pipeline import map_state as MS
            from orb_slam3_noted_tpu.pipeline import tracking as T

            all_mp = slam.m.mp_valid
            for target in (cand, slot):
                mask, _ = MS.local_map_mask(
                    slam.m, jnp.int32(target), n_neighbors=5
                )
                # fuse points NOT local to the target into the target view
                slam.m = T.fuse_map_points(
                    slam.m, jnp.int32(target), all_mp & ~mask,
                    slam.cam, slam.cfg,
                )

        # global BA after the pose-graph correction (reference spawns a GBA
        # thread from CorrectLoop, `src/LoopClosing.cc:1090-1097`); the
        # matrix-free Schur/PCG engine runs at full-map scale, so no
        # "<200 KFs" escape hatch is needed
        if self.enable_gba and getattr(slam, "cfg", None) is not None:
            from orb_slam3_noted_tpu.optim.gba import run_global_ba

            slam.m, _ = run_global_ba(
                slam.m, slam.cam, slam.cfg, bf=slam.cfg.bf,
                n_iters=6, n_iters_final=4,
            )
        # tracking state continues from the corrected pose of the current KF
        slam.last_Rcw = slam.m.kf_Rcw[slot]
        slam.last_tcw = slam.m.kf_tcw[slot]
        slam.vel = None
