"""Motion-only pose optimization tests (SURVEY §7 phase D)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import se3, so3
from orb_slam3_noted_tpu.models import cameras as C
from orb_slam3_noted_tpu.optim.pose_opt import PoseObs, pose_optimization

PIN = C.Camera(C.PINHOLE, (458.654, 457.296, 367.215, 248.375))


def make_scene(rng, n=200, dtype=np.float32):
    pts = (rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 6.0])).astype(dtype)
    Rcw = np.asarray(so3.exp(jnp.asarray([0.05, -0.1, 0.02], dtype)))
    tcw = np.array([0.3, -0.2, 0.1], dtype)
    xc = pts @ Rcw.T + tcw
    uv = np.asarray(C.project(PIN, jnp.asarray(xc)))
    return pts, Rcw, tcw, uv


class TestPoseOptimization:
    def test_recovers_pose_from_perturbation(self, rng):
        pts, Rcw, tcw, uv = make_scene(rng)
        n = len(pts)
        # perturb the initial pose
        dR = np.asarray(so3.exp(jnp.asarray([0.03, 0.02, -0.04], np.float32)))
        R0 = dR @ Rcw
        t0 = tcw + np.array([0.1, -0.05, 0.08], np.float32)
        obs = PoseObs(
            uv=jnp.asarray(uv + rng.normal(0, 0.3, size=uv.shape).astype(np.float32)),
            uv_r=jnp.zeros(n, jnp.float32),
            inv_sigma2=jnp.ones(n, jnp.float32),
            is_stereo=jnp.zeros(n, bool),
            valid=jnp.ones(n, bool),
        )
        res = pose_optimization(PIN, jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(pts), obs)
        assert int(res.n_inliers) > 0.9 * n
        np.testing.assert_allclose(np.asarray(res.Rcw), Rcw, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.tcw), tcw, atol=2e-2)

    def test_rejects_outliers(self, rng):
        pts, Rcw, tcw, uv = make_scene(rng, n=300)
        n = len(pts)
        uv_noisy = uv + rng.normal(0, 0.3, size=uv.shape)
        # corrupt 25% of the observations badly
        n_bad = n // 4
        bad = rng.choice(n, size=n_bad, replace=False)
        uv_noisy[bad] += rng.uniform(30, 120, size=(n_bad, 2)) * np.sign(
            rng.normal(size=(n_bad, 2))
        )
        dR = np.asarray(so3.exp(jnp.asarray([0.02, -0.01, 0.015], np.float32)))
        obs = PoseObs(
            uv=jnp.asarray(uv_noisy.astype(np.float32)),
            uv_r=jnp.zeros(n, jnp.float32),
            inv_sigma2=jnp.ones(n, jnp.float32),
            is_stereo=jnp.zeros(n, bool),
            valid=jnp.ones(n, bool),
        )
        res = pose_optimization(
            PIN, jnp.asarray(dR @ Rcw), jnp.asarray(tcw + 0.05), jnp.asarray(pts), obs
        )
        inl = np.asarray(res.inliers)
        # all corrupted obs excluded, most clean obs kept
        assert inl[bad].sum() == 0
        good = np.setdiff1d(np.arange(n), bad)
        assert inl[good].mean() > 0.9
        np.testing.assert_allclose(np.asarray(res.Rcw), Rcw, atol=3e-3)
        np.testing.assert_allclose(np.asarray(res.tcw), tcw, atol=3e-2)

    def test_stereo_rows(self, rng):
        pts, Rcw, tcw, uv = make_scene(rng, n=150)
        n = len(pts)
        bf = 47.9  # EuRoC-ish baseline*fx
        xc = pts @ Rcw.T + tcw
        uv_r = uv[:, 0] - bf / xc[:, 2]
        obs = PoseObs(
            uv=jnp.asarray(uv.astype(np.float32)),
            uv_r=jnp.asarray(uv_r.astype(np.float32)),
            inv_sigma2=jnp.ones(n, jnp.float32),
            is_stereo=jnp.ones(n, bool),
            valid=jnp.ones(n, bool),
        )
        dR = np.asarray(so3.exp(jnp.asarray([0.02, 0.03, -0.01], np.float32)))
        res = pose_optimization(
            PIN, jnp.asarray(dR @ Rcw), jnp.asarray(tcw - 0.07), jnp.asarray(pts),
            obs, bf=bf,
        )
        assert int(res.n_inliers) == n
        np.testing.assert_allclose(np.asarray(res.Rcw), Rcw, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.tcw), tcw, atol=1e-3)
