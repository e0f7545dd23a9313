"""SE(3): rigid transforms as (R, t) pairs.

Replaces the reference's mixture of ``cv::Mat`` 4x4 poses and ``g2o::SE3Quat``
(`/root/reference/include/Converter.h`, `Thirdparty/g2o/g2o/types/se3quat.h`)
with plain (R: (..., 3, 3), t: (..., 3)) array pairs — SoA-friendly, vmappable,
no quaternion round-trips on the hot path.

Pose convention follows the reference: a camera pose ``Tcw = (Rcw, tcw)`` maps
world points into the camera frame, ``x_c = Rcw @ x_w + tcw``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3

SE3 = Tuple[jnp.ndarray, jnp.ndarray]  # (R (...,3,3), t (...,3))


def identity(dtype=jnp.float32, batch_shape: tuple = ()) -> SE3:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype=dtype)
    return R, t


def inverse(T: SE3) -> SE3:
    R, t = T
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -jnp.einsum("...ij,...j->...i", Rinv, t)


def compose(T1: SE3, T2: SE3) -> SE3:
    """T1 * T2 (apply T2 first)."""
    R1, t1 = T1
    R2, t2 = T2
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def apply(T: SE3, x: jnp.ndarray) -> jnp.ndarray:
    """Transform points x (..., 3)."""
    R, t = T
    return jnp.einsum("...ij,...j->...i", R, x) + t


def exp(xi: jnp.ndarray) -> SE3:
    """Exponential map; xi = (rho, phi): translation part first 3, rotation last 3.

    R = exp(phi), t = Jl(phi) rho.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp(phi)
    Jl = so3.left_jacobian(phi)
    return R, jnp.einsum("...ij,...j->...i", Jl, rho)


def log(T: SE3) -> jnp.ndarray:
    """Logarithm map; returns (rho, phi)."""
    R, t = T
    phi = so3.log(R)
    Jl_inv = so3.inverse_left_jacobian(phi)
    rho = jnp.einsum("...ij,...j->...i", Jl_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def to_matrix(T: SE3) -> jnp.ndarray:
    """(..., 4, 4) homogeneous matrix."""
    R, t = T
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(M: jnp.ndarray) -> SE3:
    return M[..., :3, :3], M[..., :3, 3]


def retract(T: SE3, xi: jnp.ndarray) -> SE3:
    """Right-multiplicative update used by the optimizer: T <- T * exp(xi).

    Matches the update-in-body-frame convention of the reference's pose
    vertices (`/root/reference/include/G2oTypes.h` ``ImuCamPose::Update``).
    """
    return compose(T, exp(xi))


def normalize(T: SE3) -> SE3:
    R, t = T
    return so3.normalize(R), t
