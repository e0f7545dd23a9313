"""Robust kernels (Huber) in IRLS form.

Reference: g2o ``RobustKernelHuber`` with the thresholds the reference passes
everywhere: sqrt(5.991) for 2-dof mono edges and sqrt(7.815) for 3-dof
stereo edges (`/root/reference/src/Optimizer.cc:130-131`).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% quantile, chi2 with 2 dof
CHI2_STEREO = 7.815  # 95% quantile, chi2 with 3 dof
CHI2_TWOCAM = 9.488  # 95% quantile, chi2 with 4 dof (left+right fisheye pair)


def chi2_threshold(obs):
    """Per-observation chi2 gate: mono 2-dof, rectified-stereo 3-dof,
    two-camera (fisheye left+right joint) 4-dof."""
    th = jnp.where(obs.is_stereo, CHI2_STEREO, CHI2_MONO)
    ir = getattr(obs, "is_right", None)
    if ir is not None:
        th = jnp.where(ir, CHI2_TWOCAM, th)
    return th


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight rho'(chi2) for the Huber kernel with threshold delta^2.

    chi2 is the squared Mahalanobis norm of the residual.  Inside the
    threshold the weight is 1; outside it decays as delta/sqrt(chi2).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def huber_cost(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber rho(chi2): quadratic inside, linear outside (g2o convention)."""
    s = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = jnp.sqrt(delta2)
    return jnp.where(chi2 <= delta2, chi2, 2.0 * d * s - delta2)
