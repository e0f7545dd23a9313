"""Inertial optimization: IMU initialization and inertial factors.

Equivalents of the reference's inertial optimizer entry points:

- :func:`imu_residual` — the 9-dim preintegration residual (er, ev, ep) of
  ``EdgeInertial`` (`/root/reference/include/G2oTypes.h:491`, residual at
  `src/G2oTypes.cc:514-535`), evaluated batched.
- :func:`inertial_init` — ``Optimizer::InertialOptimization``
  (`src/Optimizer.cc:4634`): with keyframe poses fixed from the visual map,
  estimate {scale, gravity direction, per-KF velocities, shared gyro/acc
  bias} from the preintegrated segments (the core of
  ``LocalMapping::InitializeIMU`` `src/LocalMapping.cc:1274-1435`).
- :func:`apply_scaled_rotation` — ``Map::ApplyScaledRotation``: gravity-align
  and rescale the whole map after initialization.

Jacobians come from vmapped forward-mode autodiff over packed parameter
tangents — edge counts are small (K-1 segments), so this is cheap and exact.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu.preintegration import (
    GRAVITY,
    Bias,
    Preintegrated,
)

_HP = jax.lax.Precision.HIGHEST


def gravity_vec(gdir: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """g = Rwg(gdir) @ (0, 0, -G) with a 2-dof rotation (VertexGDir)."""
    w = jnp.concatenate([gdir, jnp.zeros(1, gdir.dtype)])
    Rwg = so3.exp(w)
    return Rwg @ jnp.asarray([0.0, 0.0, -GRAVITY], gdir.dtype)


def imu_residual(
    Ri, pi, vi, Rj, pj, vj, bg, ba, p: Preintegrated, g: jnp.ndarray
):
    """(9,) preintegration residual between body states i and j.

    er = Log(dR(bg)^T Ri^T Rj)
    ev = Ri^T (vj - vi - g dt) - dV(bg, ba)
    ep = Ri^T (pj - pi - vi dt - 0.5 g dt^2) - dP(bg, ba)
    """
    dbg = bg - p.bias.bg
    dba = ba - p.bias.ba
    dR = p.dR @ so3.exp(p.JRg @ dbg)
    dV = p.dV + p.JVg @ dbg + p.JVa @ dba
    dP = p.dP + p.JPg @ dbg + p.JPa @ dba
    dt = p.dT
    er = so3.log(dR.T @ Ri.T @ Rj)
    ev = Ri.T @ (vj - vi - g * dt) - dV
    ep = Ri.T @ (pj - pi - vi * dt - 0.5 * g * dt * dt) - dP
    return jnp.concatenate([er, ev, ep])


def whitener(preints: Preintegrated, eps: float = 1e-12) -> jnp.ndarray:
    """(E, 9, 9) upper-triangular whitening W with r^T C^-1 r = |W r|^2.

    The reference weights ``EdgeInertial`` by Info = C[0:9,0:9]^{-1}
    (`src/G2oTypes.cc`); we whiten residuals with W = chol(C^-1)^T so plain
    least squares reproduces the Mahalanobis norm.
    """
    C9 = preints.C[:, :9, :9]
    C9 = C9 + eps * jnp.eye(9, dtype=C9.dtype)
    info = jnp.linalg.inv(C9)
    # symmetrize for numerical safety before the Cholesky
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    L = jnp.linalg.cholesky(info)
    return jnp.swapaxes(L, -1, -2)  # W = L^T


def _linear_seed(Rwb, twb, preints: Preintegrated, valid):
    """Closed-form seed for the IMU-init GN (avoids the scale/gravity local
    minimum the coupled problem has when started from s=1, g=-z).

    Mirrors the spirit of the reference's gravity seed from velocity sums
    (`/root/reference/src/LocalMapping.cc:1332-1353`), but solves the full
    linear system: with rotations fixed, (ev, ep) are linear in metric scale
    s, gravity vector g, and metric velocities u_k:

      ev_k: Ri^T (u_{k+1} - u_k - g dt)                      = dV_k(bg)
      ep_k: Ri^T (s(p_{k+1} - p_k) - u_k dt - 0.5 g dt^2)    = dP_k(bg)

    Gyro bias is first estimated alone from the rotation residuals via the
    preintegration Jacobian JRg. Returns (log_s, gdir2, bg, v_visual).
    """
    K = Rwb.shape[0]
    dtype = twb.dtype
    E = K - 1
    vm = valid.astype(dtype)

    # -- 1. gyro bias from er(bg) ~ Log(dR^T Ri^T Rj) - JRg bg = 0 ----------
    def rot_res(k):
        eR = so3.log(preints.dR[k].T @ Rwb[k].T @ Rwb[k + 1])
        return eR, preints.JRg[k]

    eRs, Jg = jax.vmap(rot_res)(jnp.arange(E))
    # er(bg) = Log(Exp(JRg bg)^T dR^T Ri^T Rj) ~= eR - JRg bg  (first order)
    A = Jg * vm[:, None, None]
    b = eRs * vm[:, None]
    AtA = jnp.einsum("eij,eik->jk", A, A, precision=_HP) + 1e-9 * jnp.eye(3, dtype=dtype)
    # er(bg) ~= eR - JRg (bg - b0): solve for the delta, add the preint bias
    dbg_ls = jnp.linalg.solve(AtA, jnp.einsum("eij,ei->j", A, b, precision=_HP))
    bg = preints.bias.bg[0] + dbg_ls

    # -- 2. linear LS for [s, g(3), u_0..u_{K-1}] ---------------------------
    dbg = bg - preints.bias.bg  # (E, 3)
    dV = preints.dV + jnp.einsum("eij,ej->ei", preints.JVg, dbg, precision=_HP)
    dP = preints.dP + jnp.einsum("eij,ej->ei", preints.JPg, dbg, precision=_HP)
    dt = preints.dT
    n_u = 4 + 3 * K

    def seg_rows(k):
        Ri = Rwb[k].T
        Z3 = jnp.zeros((3, 3), dtype)
        z1 = jnp.zeros((3, 1), dtype)
        # row blocks: [s | g | u_k | u_{k+1}] with u scattered below
        ev_s = z1
        ev_g = -Ri * dt[k]
        ev_uk = -Ri
        ev_uk1 = Ri
        ep_s = (Ri @ (twb[k + 1] - twb[k]))[:, None]
        ep_g = -0.5 * Ri * dt[k] * dt[k]
        ep_uk = -Ri * dt[k]
        ep_uk1 = Z3
        rows = jnp.zeros((6, n_u), dtype)
        rows = rows.at[:3, 0:1].set(ev_s).at[:3, 1:4].set(ev_g)
        rows = jax.lax.dynamic_update_slice(rows, ev_uk, (0, 4 + 3 * k))
        rows = jax.lax.dynamic_update_slice(rows, ev_uk1, (0, 7 + 3 * k))
        rows = rows.at[3:, 0:1].set(ep_s).at[3:, 1:4].set(ep_g)
        rows = jax.lax.dynamic_update_slice(rows, ep_uk, (3, 4 + 3 * k))
        rows = jax.lax.dynamic_update_slice(rows, ep_uk1, (3, 7 + 3 * k))
        rhs = jnp.concatenate([dV[k], dP[k]])
        return rows * vm[k], rhs * vm[k]

    A2, b2 = jax.vmap(seg_rows)(jnp.arange(E))
    A2 = A2.reshape(-1, n_u)
    b2 = b2.reshape(-1)
    H = A2.T @ A2 + 1e-8 * jnp.eye(n_u, dtype=dtype)
    x = jnp.linalg.solve(H, A2.T @ b2)
    g = x[1:4]

    # With |g| free, scale is near-unobservable over a short gravity-dominated
    # window (the LS is barely overdetermined).  Refine with the magnitude
    # constrained to G: g = G*normalize(g0) + B dg, B = tangent basis (the
    # VINS-Mono "RefineGravity" step); iterate to re-normalize.
    def refine(g0, _):
        gn0 = g0 / jnp.maximum(jnp.linalg.norm(g0), 1e-9)
        # tangent basis orthogonal to gn0
        tmp = jnp.where(jnp.abs(gn0[0]) < 0.9,
                        jnp.asarray([1.0, 0.0, 0.0], dtype),
                        jnp.asarray([0.0, 1.0, 0.0], dtype))
        b1v = jnp.cross(gn0, tmp)
        b1v = b1v / jnp.maximum(jnp.linalg.norm(b1v), 1e-9)
        b2v = jnp.cross(gn0, b1v)
        Bt = jnp.stack([b1v, b2v], axis=1)  # (3, 2)
        # substitute g = G gn0 + Bt dg into the LS columns: cols for g (1:4)
        # become cols for dg, and G gn0 moves to the rhs
        A_g = A2[:, 1:4]
        A_dg = A_g @ Bt                                   # (rows, 2)
        rhs = b2 - A_g @ (GRAVITY * gn0)
        A_r = jnp.concatenate([A2[:, 0:1], A_dg, A2[:, 4:]], axis=1)
        Hr = A_r.T @ A_r + 1e-8 * jnp.eye(n_u - 1, dtype=dtype)
        xr = jnp.linalg.solve(Hr, A_r.T @ rhs)
        g_new = GRAVITY * gn0 + Bt @ xr[1:3]
        return g_new, xr

    g, xr_all = jax.lax.scan(refine, g, None, length=4)
    xr = jax.tree_util.tree_map(lambda a: a[-1], xr_all)
    s = jnp.clip(xr[0], 1e-3, 1e4)
    u = xr[3:].reshape(K, 3)

    # gravity direction -> 2-dof tangent: Rwg @ (0,0,-G) = G * g/|g|
    gn = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
    gI = jnp.asarray([0.0, 0.0, -1.0], dtype)
    axis = jnp.cross(gI, gn)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(gI, gn)
    ang = jnp.arctan2(sin_a, cos_a)
    w = axis / jnp.maximum(sin_a, 1e-9) * ang
    gdir = jnp.where(sin_a < 1e-9, jnp.zeros(3, dtype), w)[:2]
    return jnp.log(s), gdir, bg, u / s


class InertialInitResult(NamedTuple):
    scale: jnp.ndarray     # ()
    gdir: jnp.ndarray      # (2,) tangent of the gravity rotation
    g_world: jnp.ndarray   # (3,) gravity in the (unscaled) visual world
    bg: jnp.ndarray        # (3,)
    ba: jnp.ndarray        # (3,)
    velocities: jnp.ndarray  # (K, 3) body velocities (at the VISUAL scale;
                             # multiply by scale for metric)
    cost: jnp.ndarray
    scale_sigma: jnp.ndarray  # () marginal std of log-scale: observability
                              # gate — don't rescale the map on a weakly
                              # excited window (see LocalMapping::InitializeIMU
                              # time gating in the reference)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def inertial_init(
    Rwb: jnp.ndarray,      # (K, 3, 3) body rotations from the visual map
    twb: jnp.ndarray,      # (K, 3) body positions (visual scale)
    preints: Preintegrated,  # stacked (K-1) segments between consecutive KFs
    valid: jnp.ndarray,    # (K-1,) segment validity
    prior_g: float = 1e2,
    prior_a: float = 1e6,
    n_iters: int = 20,
    fix_scale: bool = False,
) -> InertialInitResult:
    """Estimate scale/gravity/biases/velocities with poses fixed.

    Matches the reference's staged use: ``InitializeIMU`` first calls with
    large bias priors (1e2, 1e10/1e5), refinement stages lower them
    (`src/LocalMapping.cc:187-236`).  The metric state is
    twb_metric = scale * twb, v_metric = scale * v.
    """
    K = Rwb.shape[0]
    dtype = twb.dtype

    # params: [log_s (1), gdir (2), bg (3), ba (3), v (K*3)]
    n_par = 9 + 3 * K

    def unpack(th):
        log_s = th[0]
        s = jnp.where(jnp.asarray(fix_scale), 1.0, jnp.exp(log_s))
        gdir = th[1:3]
        bg = th[3:6]
        ba = th[6:9]
        v = th[9:].reshape(K, 3)
        return s, gdir, bg, ba, v

    W = whitener(preints)  # (K-1, 9, 9) information whitening

    def residuals(th):
        s, gdir, bg, ba, v = unpack(th)
        g = gravity_vec(gdir, dtype)

        def seg(k):
            p = jax.tree_util.tree_map(lambda x: x[k], preints)
            # positions/velocities at metric scale = s * visual
            r = imu_residual(
                Rwb[k], s * twb[k], s * v[k],
                Rwb[k + 1], s * twb[k + 1], s * v[k + 1],
                bg, ba, p, g,
            )
            return W[k] @ r

        r = jax.vmap(seg)(jnp.arange(K - 1))  # (K-1, 9)
        r = r * valid[:, None]
        # bias priors (reference priorG/priorA)
        r_pg = jnp.sqrt(jnp.asarray(prior_g, dtype)) * bg
        r_pa = jnp.sqrt(jnp.asarray(prior_a, dtype)) * ba
        return jnp.concatenate([r.reshape(-1), r_pg, r_pa])

    # closed-form seed (scale/gravity/bias/velocities); without it the GN
    # falls into the s~1 local minimum when the visual scale is far from 1
    log_s0, gdir0, bg0, v0 = _linear_seed(Rwb, twb, preints, valid)
    th0 = jnp.concatenate([
        jnp.where(jnp.asarray(fix_scale), 0.0, log_s0)[None],
        gdir0, bg0, jnp.zeros(3, dtype), v0.reshape(-1),
    ]).astype(dtype)

    def gn(carry, _):
        th, lam = carry
        r = residuals(th)
        J = jax.jacfwd(residuals)(th)
        H = J.T @ J
        g_vec = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-10 * jnp.eye(n_par, dtype=dtype)
        d = jnp.linalg.solve(Hd, -g_vec)
        th_new = th + d
        better = jnp.sum(residuals(th_new) ** 2) < jnp.sum(r**2)
        th = jnp.where(better, th_new, th)
        lam = jnp.where(better, lam * 0.5, lam * 10.0)
        return (th, lam), None

    (th, _), _ = jax.lax.scan(gn, (th0, jnp.asarray(1e-4, dtype)), None, length=n_iters)
    s, gdir, bg, ba, v = unpack(th)
    cost = jnp.sum(residuals(th) ** 2)
    # marginal covariance of log_s from the Gauss-Newton Hessian; scaled by
    # the residual variance factor so sloppy visual input widens the gate
    Jf = jax.jacfwd(residuals)(th)
    Hf = Jf.T @ Jf + 1e-10 * jnp.eye(n_par, dtype=dtype)
    n_res = Jf.shape[0]
    dof = jnp.maximum(n_res - n_par, 1)
    var_factor = jnp.maximum(cost / dof, 1.0)
    cov00 = jnp.linalg.inv(Hf)[0, 0]
    scale_sigma = jnp.sqrt(jnp.maximum(cov00 * var_factor, 0.0))
    return InertialInitResult(
        scale=s, gdir=gdir, g_world=gravity_vec(gdir, dtype),
        bg=bg, ba=ba, velocities=v, cost=cost,
        scale_sigma=scale_sigma,
    )


@jax.jit
def apply_scaled_rotation(
    kf_Rcw: jnp.ndarray,
    kf_tcw: jnp.ndarray,
    mp_pos: jnp.ndarray,
    Ryw: jnp.ndarray,
    scale: jnp.ndarray,
):
    """Gravity-align (rotate world by Ryw) and rescale the map.

    Equivalent of ``Map::ApplyScaledRotation`` (`include/Map.h:93`):
    x_w' = scale * Ryw x_w;  Tcw' = Tcw composed with the inverse warp.
    Returns (kf_Rcw', kf_tcw', mp_pos').
    """
    R_new = jnp.einsum("kij,jl->kil", kf_Rcw, Ryw.T, precision=_HP)
    t_new = scale * kf_tcw
    mp_new = scale * jnp.einsum("ij,nj->ni", Ryw, mp_pos, precision=_HP)
    return R_new, t_new, mp_new
