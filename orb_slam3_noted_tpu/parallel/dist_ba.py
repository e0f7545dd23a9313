"""Distributed bundle adjustment over a device mesh.

The multi-chip path of SURVEY §2.3/§7-F: the observation table (the large
axis — O >> K, M) is sharded across devices on an ``obs`` mesh axis; every
device evaluates residuals/Jacobians for its shard and contributes partial
Hpp/Hll/U/g blocks; ``psum`` over ICI produces the global blocks; the Schur
reduction and the (small) pose solve run replicated on every device — the
same "assemble-with-collectives, solve-replicated" recipe as the reference's
north star (BASELINE.json) prescribes for the reduced camera system.

Works identically on a real TPU slice and on the virtual CPU mesh used by
tests (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from orb_slam3_noted_tpu.geometry import se3, so3
from orb_slam3_noted_tpu.geometry.linalg3 import inv3
from orb_slam3_noted_tpu.models import cameras as cam_mod
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.optim.robust import CHI2_MONO, CHI2_STEREO, huber_weight

_HP = jax.lax.Precision.HIGHEST


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _partial_blocks(cam, Rcw, tcw, points, obs, bf, use_huber):
    """Per-shard contributions to the normal equations (runs per device)."""
    K = Rcw.shape[0]
    M = points.shape[0]
    r, Jp, Jl, chi2, ok, _ = factors.reproj_residuals(
        cam, Rcw, tcw, points, obs, bf=bf
    )
    delta2 = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
    w_rob = jnp.where(use_huber, huber_weight(chi2, delta2), 1.0)
    w = jnp.where(ok, obs.inv_sigma2 * w_rob, 0.0)
    wJp = w[:, None, None] * Jp
    Hpp = jax.ops.segment_sum(
        jnp.einsum("oai,oaj->oij", wJp, Jp, precision=_HP), obs.pose_idx, K
    )
    gp = jax.ops.segment_sum(
        jnp.einsum("oai,oa->oi", Jp, w[:, None] * r, precision=_HP), obs.pose_idx, K
    )
    Hll = jax.ops.segment_sum(
        jnp.einsum("oai,oaj->oij", w[:, None, None] * Jl, Jl, precision=_HP),
        obs.point_idx, M,
    )
    gl = jax.ops.segment_sum(
        jnp.einsum("oai,oa->oi", Jl, w[:, None] * r, precision=_HP), obs.point_idx, M
    )
    W_o = jnp.einsum("oai,oaj->oij", wJp, Jl, precision=_HP)
    U = jnp.zeros((K, 6, M, 3), r.dtype).at[obs.pose_idx, :, obs.point_idx, :].add(W_o)
    cost = jnp.sum(jnp.where(ok, chi2, 0.0))
    return Hpp, gp, Hll, gl, U, cost


@partial(
    jax.jit,
    static_argnames=("cam", "mesh", "bf", "lam"),
)
def distributed_lm_step(
    cam: cam_mod.Camera,
    mesh: Mesh,
    Rcw: jnp.ndarray,
    tcw: jnp.ndarray,
    points: jnp.ndarray,
    obs: factors.ReprojObs,
    pose_fixed: jnp.ndarray,
    point_fixed: jnp.ndarray,
    bf: float = 0.0,
    lam: float = 1e-4,
):
    """One damped Schur/LM step with the observation axis sharded.

    obs arrays must have leading dim divisible by the mesh size; the caller
    pads with invalid observations.  Returns (Rcw, tcw, points, cost).
    """
    axis = mesh.axis_names[0]
    dtype = tcw.dtype
    K = Rcw.shape[0]

    rep = P()
    shard = P(axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, shard, rep, rep),
        out_specs=(rep, rep, rep, rep),
    )
    def step(Rcw, tcw, pts, obs_shard, p_fix, l_fix):
        use_huber = jnp.asarray(True)
        Hpp, gp, Hll, gl, U, cost = _partial_blocks(
            cam, Rcw, tcw, pts, obs_shard, bf, use_huber
        )
        # global reduction over the mesh (ICI collectives)
        Hpp = jax.lax.psum(Hpp, axis)
        gp = jax.lax.psum(gp, axis)
        Hll = jax.lax.psum(Hll, axis)
        gl = jax.lax.psum(gl, axis)
        U = jax.lax.psum(U, axis)
        cost = jax.lax.psum(cost, axis)

        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hpp = Hpp + lam * Hpp * eye6 + (1e-8 + p_fix.astype(dtype))[:, None, None] * eye6
        Hll = Hll + lam * Hll * eye3 + (1e-8 + l_fix.astype(dtype))[:, None, None] * eye3
        Cinv = inv3(Hll)
        V = jnp.einsum("kamb,mbc->kamc", U, Cinv, precision=_HP)
        S = -jnp.einsum("kamc,jdmc->kajd", V, U, precision=_HP)
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(Hpp)
        rhs = -gp + jnp.einsum("kamc,mc->ka", V, gl, precision=_HP)
        dp = jnp.linalg.solve(S.reshape(K * 6, K * 6), rhs.reshape(K * 6)).reshape(K, 6)
        dl = jnp.einsum(
            "mbc,mc->mb", Cinv,
            -gl - jnp.einsum("kamb,ka->mb", U, dp, precision=_HP),
            precision=_HP,
        )
        R_new, t_new = se3.compose(se3.exp(dp), (Rcw, tcw))
        return so3.normalize(R_new), t_new, pts + dl, cost

    return step(Rcw, tcw, points, obs, pose_fixed, point_fixed)


def pad_obs_for_mesh(obs: factors.ReprojObs, n_devices: int) -> factors.ReprojObs:
    """Pad the observation table to a multiple of the mesh size (invalid pad)."""
    O = obs.pose_idx.shape[0]
    pad = (-O) % n_devices
    if pad == 0:
        return obs
    f = lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return factors.ReprojObs(
        pose_idx=f(obs.pose_idx),
        point_idx=f(obs.point_idx),
        uv=f(obs.uv),
        uv_r=f(obs.uv_r),
        inv_sigma2=f(obs.inv_sigma2),
        is_stereo=f(obs.is_stereo),
        valid=jnp.concatenate([obs.valid, jnp.zeros(pad, bool)]),
    )


def distributed_bundle_adjust(
    cam: cam_mod.Camera,
    mesh: Mesh,
    Rcw, tcw, points, obs, pose_fixed, point_fixed,
    n_iters: int = 10,
    bf: float = 0.0,
):
    """Fixed-iteration distributed LM (monotone damping handled per step)."""
    obs = pad_obs_for_mesh(obs, mesh.size)
    cost = None
    for _ in range(n_iters):
        Rcw, tcw, points, cost = distributed_lm_step(
            cam, mesh, Rcw, tcw, points, obs, pose_fixed, point_fixed, bf=bf
        )
    return Rcw, tcw, points, cost
