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


class InertialInitResult(NamedTuple):
    scale: jnp.ndarray     # ()
    gdir: jnp.ndarray      # (2,) tangent of the gravity rotation
    g_world: jnp.ndarray   # (3,) gravity in the (unscaled) visual world
    bg: jnp.ndarray        # (3,)
    ba: jnp.ndarray        # (3,)
    velocities: jnp.ndarray  # (K, 3) body velocities (at the VISUAL scale;
                             # multiply by scale for metric)
    cost: jnp.ndarray


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

    th0 = jnp.zeros(n_par, dtype)

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
    return InertialInitResult(
        scale=s, gdir=gdir, g_world=gravity_vec(gdir, dtype),
        bg=bg, ba=ba, velocities=v, cost=cost,
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
