"""Trajectory evaluation: Sim(3)-aligned RMS ATE.

Python-3 re-implementation of the reference's evaluation protocol
(`/root/reference/evaluation/evaluate_ate_scale.py`): Horn alignment of the
estimated trajectory to ground truth (optionally with scale, for monocular)
followed by RMS of the translational residuals.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry.horn import horn_sim3


def ate_rmse(
    est_pos: np.ndarray, gt_pos: np.ndarray, with_scale: bool = True
):
    """RMS ATE after (Sim3 | SE3) alignment of matched position sequences.

    est_pos/gt_pos: (N, 3) positions at corresponding timestamps.
    Returns (rmse, aligned_est, (R, t, s)).
    """
    est = jnp.asarray(np.asarray(est_pos))
    gt = jnp.asarray(np.asarray(gt_pos))
    R, t, s = horn_sim3(est, gt, fix_scale=not with_scale)
    aligned = np.asarray(s * (est @ jnp.asarray(R).T) + t)
    err = aligned - np.asarray(gt)
    rmse = float(np.sqrt((err ** 2).sum(axis=1).mean()))
    return rmse, aligned, (np.asarray(R), np.asarray(t), float(s))
