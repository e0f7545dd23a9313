"""Global BA (matrix-free Schur + PCG) recovers a perturbed synthetic map.

Mirrors the test strategy for the dense engine (test_ba.py): known poses +
projected points, perturb, optimize, require near-exact recovery — and
cross-check that the PCG engine matches the dense-Schur engine on the same
problem.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.optim.ba import BAProblem, bundle_adjust
from orb_slam3_noted_tpu.optim.gba import global_bundle_adjust

CAM = Camera(PINHOLE, (400.0, 400.0, 320.0, 240.0))


def _synthetic_problem(rng, K=6, M=120, noise=0.0):
    """K cameras on an arc looking at M points in front of them."""
    pts = np.stack([
        rng.uniform(-2, 2, M), rng.uniform(-1.5, 1.5, M), rng.uniform(4, 8, M)
    ], axis=1)
    Rs, ts = [], []
    for k in range(K):
        ang = 0.05 * (k - K / 2)
        R = np.array([
            [np.cos(ang), 0, np.sin(ang)],
            [0, 1, 0],
            [-np.sin(ang), 0, np.cos(ang)],
        ])
        t = np.array([0.3 * k, 0.02 * k, 0.0])
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)

    pose_idx = np.repeat(np.arange(K), M).astype(np.int32)
    point_idx = np.tile(np.arange(M), K).astype(np.int32)
    xc = np.einsum("oij,oj->oi", Rs[pose_idx], pts[point_idx]) + ts[pose_idx]
    fx, fy, cx, cy = CAM.params
    uv = np.stack([
        fx * xc[:, 0] / xc[:, 2] + cx, fy * xc[:, 1] / xc[:, 2] + cy
    ], axis=1)
    uv += noise * rng.standard_normal(uv.shape)
    obs = factors.ReprojObs(
        pose_idx=jnp.asarray(pose_idx),
        point_idx=jnp.asarray(point_idx),
        uv=jnp.asarray(uv, jnp.float32),
        uv_r=jnp.full((len(uv),), -1.0, jnp.float32),
        inv_sigma2=jnp.ones(len(uv), jnp.float32),
        is_stereo=jnp.zeros(len(uv), bool),
        valid=jnp.ones(len(uv), bool),
    )
    return Rs, ts, pts, obs


def test_gba_recovers_perturbed_map(rng):
    Rs, ts, pts, obs = _synthetic_problem(rng)
    K, M = len(Rs), len(pts)
    # perturb everything except the gauge anchors (poses 0 and 1 — two
    # fixed poses pin the monocular scale gauge as well)
    ts_p = ts + 0.03 * rng.standard_normal(ts.shape)
    ts_p[:2] = ts[:2]
    pts_p = pts + 0.05 * rng.standard_normal(pts.shape)
    prob = BAProblem(
        Rcw=jnp.asarray(Rs, jnp.float32),
        tcw=jnp.asarray(ts_p, jnp.float32),
        points=jnp.asarray(pts_p, jnp.float32),
        obs=obs,
        pose_fixed=jnp.zeros(K, bool).at[0].set(True).at[1].set(True),
        point_fixed=jnp.zeros(M, bool),
    )
    res = global_bundle_adjust(CAM, prob, n_iters=10, n_iters_final=5)
    t_err = np.abs(np.asarray(res.tcw) - ts).max()
    p_err = np.abs(np.asarray(res.points) - pts).max()
    assert t_err < 1e-3, t_err
    assert p_err < 1e-3, p_err
    assert bool(np.asarray(res.inlier).all())


def test_gba_matches_dense_engine(rng):
    Rs, ts, pts, obs = _synthetic_problem(rng, noise=0.5)
    K, M = len(Rs), len(pts)
    ts_p = ts + 0.02 * rng.standard_normal(ts.shape)
    ts_p[0] = ts[0]
    pts_p = pts + 0.03 * rng.standard_normal(pts.shape)
    prob = BAProblem(
        Rcw=jnp.asarray(Rs, jnp.float32),
        tcw=jnp.asarray(ts_p, jnp.float32),
        points=jnp.asarray(pts_p, jnp.float32),
        obs=obs,
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        point_fixed=jnp.zeros(M, bool),
    )
    dense = bundle_adjust(CAM, prob, n_iters=5, n_iters_final=5)
    pcg = global_bundle_adjust(CAM, prob, n_iters=5, n_iters_final=5)
    # both engines should land on the same optimum (noise floor apart)
    assert np.abs(np.asarray(dense.tcw) - np.asarray(pcg.tcw)).max() < 5e-3
    assert float(pcg.cost) <= 1.05 * float(dense.cost) + 1e-3


def test_gba_fixed_entries_do_not_move(rng):
    Rs, ts, pts, obs = _synthetic_problem(rng)
    K, M = len(Rs), len(pts)
    prob = BAProblem(
        Rcw=jnp.asarray(Rs, jnp.float32),
        tcw=jnp.asarray(ts + 0.05, jnp.float32),
        points=jnp.asarray(pts, jnp.float32),
        obs=obs,
        pose_fixed=jnp.ones(K, bool),     # everything fixed
        point_fixed=jnp.zeros(M, bool).at[:10].set(True),
    )
    res = global_bundle_adjust(CAM, prob, n_iters=3, n_iters_final=2)
    assert np.abs(np.asarray(res.tcw) - (ts + 0.05)).max() < 1e-6
    assert np.abs(np.asarray(res.points)[:10] - pts[:10]).max() < 1e-6
