"""Sim(3): similarity transforms (R, t, s) for loop closing and map merging.

Replaces ``g2o::Sim3`` (`/root/reference/Thirdparty/g2o/g2o/types/sim3.h`) used
by the reference's Sim3Solver, OptimizeSim3 and the essential-graph
optimization.  Representation: (R (..., 3, 3), t (..., 3), s (...,)) with
action x -> s R x + t.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3

Sim3 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (R, t, s)

_EPS = 1e-5


def identity(dtype=jnp.float32) -> Sim3:
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), jnp.ones((), dtype=dtype)


def apply(S: Sim3, x: jnp.ndarray) -> jnp.ndarray:
    R, t, s = S
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def compose(S1: Sim3, S2: Sim3) -> Sim3:
    """S1 * S2 (apply S2 first)."""
    R1, t1, s1 = S1
    R2, t2, s2 = S2
    return (
        R1 @ R2,
        s1[..., None] * jnp.einsum("...ij,...j->...i", R1, t2) + t1,
        s1 * s2,
    )


def inverse(S: Sim3) -> Sim3:
    R, t, s = S
    Rinv = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    return Rinv, -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rinv, t), sinv


def from_se3(R: jnp.ndarray, t: jnp.ndarray) -> Sim3:
    return R, t, jnp.ones(R.shape[:-2], dtype=R.dtype)


def exp(xi: jnp.ndarray) -> Sim3:
    """Exponential map; xi = (rho(3), phi(3), sigma(1)) -> (R, t, s).

    s = e^sigma, R = exp(phi), t = W rho where W is the Sim(3) "V" matrix
    combining rotation and scale integrals (standard closed form, see e.g.
    Strasdat's thesis).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    t2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(t2)
    s = jnp.exp(sigma)
    R = so3.exp(phi)
    W = so3.hat(phi)
    W2 = W @ W
    eye = jnp.eye(3, dtype=xi.dtype)

    small_s = jnp.abs(sigma) < _EPS
    small_t = theta < _EPS
    sig = jnp.where(small_s, 1.0, sigma)
    th = jnp.where(small_t, 1.0, theta)

    # Coefficients of V = A*I + B*W + C*W2 (Strasdat closed form).
    # C0 = (s - 1) / sigma
    C0 = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig)

    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = t2 + sigma * sigma
    c_safe = jnp.where(c < 1e-12, 1.0, c)

    # A1 = (a*sigma + (1-b)*theta) / (theta * c)
    A1_gen = (a * sigma + (1.0 - b) * theta) / (th * c_safe)
    # Taylor in theta->0 (keep sigma): A1 -> (s*sigma - s + 1)/sigma^2 ... use
    # combined small-angle fallback below.
    B1_gen = (C0 - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.where(
        small_t, 1.0, t2
    )

    # Small-theta fallbacks (scale still arbitrary):
    # A1 -> (s(sigma-1)+1)/sigma^2 ; B1 -> ... ; for small sigma too: 1/2, 1/6.
    A1_small_t = jnp.where(
        small_s,
        0.5 + sigma / 3.0,
        (s * (sig - 1.0) + 1.0) / (sig * sig),
    )
    B1_small_t = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (C0 - A1_small_t) / 1.0,  # placeholder refined below
    )
    # For B1 with small theta and general sigma, expand:
    # B1 = (s(sigma^2/2 - sigma + 1) - 1) / sigma^3  (third-order Taylor)
    B1_small_t = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (s * (sig * sig / 2.0 - sig + 1.0) - 1.0) / (sig * sig * sig),
    )

    A1 = jnp.where(small_t, A1_small_t, A1_gen)
    B1 = jnp.where(small_t, B1_small_t, B1_gen)

    V = C0[..., None, None] * eye + A1[..., None, None] * W + B1[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t, s


def log(S: Sim3) -> jnp.ndarray:
    """Logarithm map -> (rho, phi, sigma); inverse of :func:`exp`.

    Computes V from (phi, sigma) as in :func:`exp` and solves V rho = t.
    """
    R, t, s = S
    phi = so3.log(R)
    sigma = jnp.log(s)
    # Build V with the same coefficients as exp(), then solve V rho = t.
    t2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(t2)
    W = so3.hat(phi)
    W2 = W @ W
    eye = jnp.eye(3, dtype=phi.dtype)
    small_s = jnp.abs(sigma) < _EPS
    small_t = theta < _EPS
    sig = jnp.where(small_s, 1.0, sigma)
    th = jnp.where(small_t, 1.0, theta)
    C0 = jnp.where(small_s, 1.0 + sigma / 2.0 + sigma * sigma / 6.0, (s - 1.0) / sig)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = t2 + sigma * sigma
    c_safe = jnp.where(c < 1e-12, 1.0, c)
    A1_gen = (a * sigma + (1.0 - b) * theta) / (th * c_safe)
    B1_gen = (C0 - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.where(small_t, 1.0, t2)
    A1_small_t = jnp.where(small_s, 0.5 + sigma / 3.0, (s * (sig - 1.0) + 1.0) / (sig * sig))
    B1_small_t = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        (s * (sig * sig / 2.0 - sig + 1.0) - 1.0) / (sig * sig * sig),
    )
    A1 = jnp.where(small_t, A1_small_t, A1_gen)
    B1 = jnp.where(small_t, B1_small_t, B1_gen)
    V = C0[..., None, None] * eye + A1[..., None, None] * W + B1[..., None, None] * W2
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
