"""Batched reprojection residuals and analytic Jacobians.

Equivalent of the reference's visual g2o edges
(`/root/reference/include/OptimizableTypes.h` ``EdgeSE3ProjectXYZ(OnlyPose)``
and `/root/reference/include/G2oTypes.h` ``EdgeMono/EdgeStereo``) evaluated
for ALL observations at once.

Conventions:
- Camera pose is Tcw = (Rcw (3,3), tcw (3,)): x_c = Rcw x_w + tcw.
- The optimizer update is left-multiplicative, Tcw <- exp(xi) Tcw with
  xi = (rho, phi), so d(x_c)/d(xi) = [I3 | -hat(x_c)].
- Residual r = uv_obs - project(x_c) (same sign as g2o's ``computeError``).
- Stereo residual is (u, v, u_right) with u_right = u - bf/z
  (`include/G2oTypes.h` EdgeStereo, `src/Frame.cc` virtual right coord).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.models import cameras as cam_mod


class ReprojObs(NamedTuple):
    """Static-shape observation table for reprojection factors.

    For mono observations, ``uv_r`` is ignored and ``is_stereo`` False; the
    third residual row is masked out.
    """

    pose_idx: jnp.ndarray   # (O,) int32 into the pose table
    point_idx: jnp.ndarray  # (O,) int32 into the landmark table
    uv: jnp.ndarray         # (O, 2) pixel measurement
    uv_r: jnp.ndarray       # (O,) right-image u coordinate (stereo only)
    inv_sigma2: jnp.ndarray  # (O,) information scale (1 / level sigma^2)
    is_stereo: jnp.ndarray  # (O,) bool
    valid: jnp.ndarray      # (O,) bool
    # non-rectified second camera (fisheye stereo, reference EdgeMono
    # to-body with Tlr, `include/G2oTypes.h:339-489`): a full 2D observation
    # in the RIGHT camera joined to the left rows (4-row residual)
    uv2: jnp.ndarray | None = None       # (O, 2) right-camera pixel
    is_right: jnp.ndarray | None = None  # (O,) bool


def reproj_residuals(
    cam: cam_mod.Camera,
    Rcw: jnp.ndarray,    # (K, 3, 3)
    tcw: jnp.ndarray,    # (K, 3)
    points: jnp.ndarray,  # (M, 3)
    obs: ReprojObs,
    bf: float = 0.0,
    cam2: cam_mod.Camera | None = None,
    Rrl: jnp.ndarray | None = None,   # (3,3) left-cam -> right-cam rotation
    trl: jnp.ndarray | None = None,   # (3,)
):
    """Residuals r (O, 3), Jacobians Jp (O, 3, 6), Jl (O, 3, 3), chi2 (O,).

    The third row is active only for stereo observations. chi2 includes the
    information weighting (inv_sigma2) and is 0 for invalid observations.
    """
    R = Rcw[obs.pose_idx]           # (O, 3, 3)
    t = tcw[obs.pose_idx]           # (O, 3)
    xw = points[obs.point_idx]      # (O, 3)
    xc = jnp.einsum("oij,oj->oi", R, xw) + t
    z = xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)

    params = cam.params_array(xc.dtype)
    if cam.kind == cam_mod.PINHOLE:
        uv_hat = cam_mod.pinhole_project(params, xc)
        Jproj = cam_mod.pinhole_project_jac(params, xc)  # (O, 2, 3)
    else:
        uv_hat = cam_mod.kb8_project(params, xc)
        Jproj = cam_mod.kb8_project_jac(params, xc)

    r2 = obs.uv - uv_hat  # (O, 2)

    # stereo third row: u_r = u_hat - bf / z
    ur_hat = uv_hat[:, 0] - bf / z_safe
    r3 = jnp.where(obs.is_stereo, obs.uv_r - ur_hat, 0.0)

    # d(x_c)/d(xi) = [I | -hat(x_c)]
    O = xc.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), (O, 3, 3))
    dxc_dxi = jnp.concatenate([eye, -so3.hat(xc)], axis=-1)  # (O, 3, 6)

    # third projection row: d(u_r)/d(x_c) = d(u)/d(x_c) + [0, 0, bf/z^2]
    row3 = Jproj[:, 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf / (z_safe * z_safe)], axis=-1
    )
    row3 = jnp.where(obs.is_stereo[:, None], row3, 0.0)

    two_cam = (
        obs.is_right is not None and cam2 is not None and Rrl is not None
    )
    if two_cam:
        # right-camera rows: x_r = Rrl x_c + trl, residual uv2 - proj2(x_r)
        # (reference two-camera EdgeMono with Tlr; joint 4-row residual so
        # both edges of a pair share one observation row)
        #
        # Two deliberate approximations vs the reference's independent
        # right-camera edge (`src/Optimizer.cc` ToBody edges):
        # (1) the right rows reuse the LEFT keypoint's inv_sigma2 — the
        #     matched right feature's pyramid level is not stored in the
        #     map tables; fisheye pairs are matched inside the lapping area
        #     at similar scales, so the level mismatch is generally <=1
        #     (<1.44x weight error);
        # (2) right-ONLY observations (a landmark seen only by the second
        #     camera) are not representable — every observation row is
        #     anchored at a left feature.  The reference creates such
        #     edges; dropping them loses a small fraction of fisheye
        #     constraints near the right camera's exclusive field of view.
        xr = jnp.einsum("ij,oj->oi", Rrl, xc) + trl
        params2 = cam2.params_array(xc.dtype)
        if cam2.kind == cam_mod.PINHOLE:
            uv2_hat = cam_mod.pinhole_project(params2, xr)
            Jproj2 = cam_mod.pinhole_project_jac(params2, xr)
        else:
            uv2_hat = cam_mod.kb8_project(params2, xr)
            Jproj2 = cam_mod.kb8_project_jac(params2, xr)
        use_r = obs.is_right[:, None]
        r_right = jnp.where(use_r, obs.uv2 - uv2_hat, 0.0)       # (O, 2)
        r = jnp.concatenate([r2, r3[:, None], r_right], axis=-1)  # (O, 5)
        # chain: d(uv2)/d(x_c) = Jproj2 @ Rrl
        Jright = jnp.einsum("oab,bc->oac", Jproj2, Rrl)
        Jright = jnp.where(use_r[:, :, None], Jright, 0.0)
        Jfull = jnp.concatenate(
            [Jproj, row3[:, None, :], Jright], axis=1
        )  # (O, 5, 3)
        ok_r = obs.is_right & (xr[:, 2] <= 1e-4)  # right point behind cam
    else:
        r = jnp.concatenate([r2, r3[:, None]], axis=-1)  # (O, 3)
        Jfull = jnp.concatenate([Jproj, row3[:, None, :]], axis=1)  # (O, 3, 3)
        ok_r = None

    # r = obs - h(x): dr/dx = -J
    Jp = -jnp.einsum("oab,obc->oac", Jfull, dxc_dxi)  # (O, 3, 6)
    Jl = -jnp.einsum("oab,obc->oac", Jfull, R)        # (O, 3, 3)

    # behind-camera observations are invalid for pinhole; degenerate points
    # at the camera centre (e.g. the map table's zero-padding rows routed
    # through with valid=False) are invalid for any model
    ok = obs.valid & (jnp.sum(xc * xc, axis=-1) > 1e-10)
    if cam.kind == cam_mod.PINHOLE:
        ok = ok & (z > 1e-4)
    if ok_r is not None:
        ok = ok & ~ok_r
    # Sanitize: padding rows can produce inf/nan Jacobians (KB8 at r ~ 0
    # overflows f32), and NaN * 0-weight = NaN would poison the segment-sum
    # normal equations downstream.  Zero masked rows and clamp magnitudes
    # (real pixel Jacobians are <= ~1e4; 1e6 never clips a live row).
    okm = ok[:, None, None]
    Jp = jnp.clip(
        jnp.nan_to_num(Jp * okm, nan=0.0, posinf=0.0, neginf=0.0), -1e6, 1e6
    )
    Jl = jnp.clip(
        jnp.nan_to_num(Jl * okm, nan=0.0, posinf=0.0, neginf=0.0), -1e6, 1e6
    )
    r = jnp.clip(
        jnp.nan_to_num(r * ok[:, None], nan=0.0, posinf=0.0, neginf=0.0),
        -1e6, 1e6,
    )
    rdim = jnp.where(obs.is_stereo, 3.0, 2.0)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    chi2 = jnp.where(ok, chi2, 0.0)
    return r, Jp, Jl, chi2, ok, rdim
