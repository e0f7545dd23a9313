"""Two-view relative pose (monocular bootstrap) as batched RANSAC.

TPU-native equivalent of `/root/reference/src/TwoViewReconstruction.cc`
(``Reconstruct``: 200 RANSAC iterations each for homography and fundamental,
model selection by score ratio, motion recovery, triangulation with
cheirality/parallax gating).

Design departures (intentional): since we always work with calibrated
bearing rays (the camera model already unprojects, including fisheye), the
fundamental path becomes an 8-point **essential** RANSAC, and the homography
path a 4-point calibrated homography RANSAC (both scored with symmetric
epipolar / transfer error in normalized coordinates).  All hypotheses are
built and scored in one batch: (n_hyp, 8) minimal sets -> batched SVD ->
(n_hyp, N) error matrix -> argmax inliers.  Cheirality disambiguation
triangulates all candidates at once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.geometry.triangulation import triangulate_dlt

_HP = jax.lax.Precision.HIGHEST


class TwoViewResult(NamedTuple):
    success: jnp.ndarray    # () bool
    R21: jnp.ndarray        # (3, 3) rotation cam1 -> cam2
    t21: jnp.ndarray        # (3,) unit-norm translation
    points1: jnp.ndarray    # (N, 3) triangulated points in cam-1 frame
    is_inlier: jnp.ndarray  # (N,) bool (good triangulation + epipolar inlier)
    n_inliers: jnp.ndarray  # () int32


def _eight_point_essential(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point essential matrix from z=1 rays.

    x1, x2: (H, 8, 3) minimal sets. Returns (H, 3, 3) E with rank-2 projection.
    Constraint: x2^T E x1 = 0.
    """
    a1, b1 = x1[..., 0], x1[..., 1]
    a2, b2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(a1)
    A = jnp.stack(
        [a2 * a1, a2 * b1, a2, b2 * a1, b2 * b1, b2, a1, b1, one], axis=-1
    )  # (H, 8, 9)
    # nullspace: last right singular vector
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[..., -1, :].reshape(-1, 3, 3)
    # project to essential manifold: singular values -> (1, 1, 0)
    U, S, Vt2 = jnp.linalg.svd(E)
    D = jnp.zeros_like(E).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return U @ D @ Vt2


def _sampson_error(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Sampson epipolar error; E (H,3,3), x1/x2 (N,3) -> (H, N)."""
    Ex1 = jnp.einsum("hij,nj->hni", E, x1, precision=_HP)
    Etx2 = jnp.einsum("hji,nj->hni", E, x2, precision=_HP)
    x2Ex1 = jnp.einsum("ni,hni->hn", x2, Ex1, precision=_HP)
    denom = (
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    )
    return x2Ex1 * x2Ex1 / jnp.maximum(denom, 1e-12)


def _decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t) with det(R) = +1, |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    return (R1, t), (R1, -t), (R2, t), (R2, -t)


@partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct_two_views(
    rays1: jnp.ndarray,
    rays2: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    err_thresh: float = 1e-5,
    min_parallax_cos: float = 0.99998,
    n_hyp: int = 256,
) -> TwoViewResult:
    """Relative pose + structure from matched bearing rays.

    rays1/rays2: (N, 3) z=1 rays of matched features (padded; see valid).
    err_thresh: Sampson threshold in normalized coords, ~ (3.84 px / fx)^2 as
    the reference's chi2 gating (`TwoViewReconstruction.cc` sigma-based score).
    min_parallax_cos: triangulated points need parallax below this cosine
    (reference requires ~1 deg for init).
    """
    n = rays1.shape[0]
    dtype = rays1.dtype

    # --- sample minimal sets (probability mass on valid entries) ---
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    keys = jax.random.split(key, n_hyp)
    idx = jax.vmap(
        lambda k: jax.random.choice(k, n, shape=(8,), replace=False, p=p)
    )(keys)  # (H, 8)

    E = _eight_point_essential(rays1[idx], rays2[idx])  # (H, 3, 3)
    err = _sampson_error(E, rays1, rays2)               # (H, N)
    inl = (err < err_thresh) & valid[None, :]
    # reference-style score: sum of truncated per-point scores
    score = jnp.sum(jnp.where(inl, err_thresh - err, 0.0), axis=-1)
    best = jnp.argmax(score)
    E_best = E[best]
    inl_best = inl[best]

    # --- refit E on all inliers of the best hypothesis (least squares) ---
    w = inl_best.astype(dtype)
    a1, b1 = rays1[:, 0], rays1[:, 1]
    a2, b2 = rays2[:, 0], rays2[:, 1]
    A = jnp.stack(
        [a2 * a1, a2 * b1, a2, b2 * a1, b2 * b1, b2, a1, b1, jnp.ones_like(a1)],
        axis=-1,
    ) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E_ls = Vt[-1].reshape(3, 3)
    U, _, Vt2 = jnp.linalg.svd(E_ls)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype))
    E_best = U @ D @ Vt2
    err_best = _sampson_error(E_best[None], rays1, rays2)[0]
    inl_best = (err_best < err_thresh) & valid

    # --- cheirality: pick the (R, t) explaining the most inlier points ---
    cands = _decompose_essential(E_best[None])

    def check(Rt):
        R21, t21 = Rt[0][0], Rt[1][0]
        pts1 = triangulate_dlt(rays1, rays2, R21, t21)
        z1 = pts1[:, 2]
        p2 = pts1 @ R21.T + t21
        z2 = p2[:, 2]
        # reprojection gate in normalized coords (reference CheckRT's 4-sigma
        # pixel check): garbage triangulations from degenerate geometry fail it
        z1s = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
        z2s = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
        e1 = jnp.sum((pts1[:, :2] / z1s[:, None] - rays1[:, :2]) ** 2, axis=-1)
        e2 = jnp.sum((p2[:, :2] / z2s[:, None] - rays2[:, :2]) ** 2, axis=-1)
        reproj_ok = (e1 < 4.0 * err_thresh) & (e2 < 4.0 * err_thresh)
        # parallax between the two rays to the point
        r1 = pts1
        r2 = pts1 - (-R21.T @ t21)  # vector from cam2 center (in cam1 frame)
        cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-12
        )
        good = (
            inl_best
            & (z1 > 1e-6)
            & (z2 > 1e-6)
            & (cosp < min_parallax_cos)
            & reproj_ok
        )
        return good, pts1, R21, t21, cosp

    goods, ptss, Rs, ts, cosps = [], [], [], [], []
    for c in cands:
        g, p3, R21, t21, cosp = check(c)
        goods.append(g)
        ptss.append(p3)
        Rs.append(R21)
        ts.append(t21)
        cosps.append(cosp)
    goods = jnp.stack(goods)
    counts = jnp.sum(goods, axis=-1)
    kbest = jnp.argmax(counts)
    n_good = counts[kbest]
    n_second = jnp.sort(counts)[-2]

    # Success criteria mirroring the reference (`TwoViewReconstruction.cc`
    # minTriangulated=50, minParallax=1 deg checked at the 50th-best point):
    # enough well-triangulated points, a clear cheirality winner, and real
    # parallax (guards against near-pure-rotation bootstraps whose points
    # leak through the per-point gates via noise).
    cosp_best = jnp.where(goods[kbest], jnp.stack(cosps)[kbest], 1.0)
    cosp_sorted = jnp.sort(cosp_best)  # ascending = best parallax first
    parallax_50 = cosp_sorted[jnp.minimum(49, cosp_sorted.shape[0] - 1)]
    success = (
        (n_good >= 50)
        & (n_second < 0.75 * n_good)
        & (parallax_50 < jnp.cos(jnp.deg2rad(1.0)))
    )
    return TwoViewResult(
        success=success,
        R21=jnp.stack(Rs)[kbest],
        t21=jnp.stack(ts)[kbest],
        points1=jnp.stack(ptss)[kbest],
        is_inlier=goods[kbest],
        n_inliers=n_good.astype(jnp.int32),
    )
