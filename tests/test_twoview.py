"""Two-view reconstruction (mono init) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.geometry.twoview import reconstruct_two_views


def make_pair(rng, n=300, n_out=40, noise=5e-4, dtype=np.float32):
    pts = (rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0]))
    R21 = np.asarray(so3.exp(jnp.asarray([0.02, -0.1, 0.03], np.float64)))
    t21 = np.array([-0.35, 0.04, 0.06])
    p2 = pts @ R21.T + t21
    r1 = pts / pts[:, 2:3]
    r2 = p2 / p2[:, 2:3]
    r1[:, :2] += rng.normal(0, noise, size=(n, 2))
    r2[:, :2] += rng.normal(0, noise, size=(n, 2))
    # outliers: corrupt matches
    bad = rng.choice(n, size=n_out, replace=False)
    r2[bad, :2] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    return (
        jnp.asarray(r1.astype(dtype)),
        jnp.asarray(r2.astype(dtype)),
        R21.astype(dtype),
        t21.astype(dtype),
        bad,
    )


class TestTwoView:
    def test_recover_pose(self, rng):
        r1, r2, R21, t21, bad = make_pair(rng)
        res = reconstruct_two_views(
            r1, r2, jnp.ones(r1.shape[0], bool), jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.R21), R21, atol=2e-3)
        # translation up to scale
        t_est = np.asarray(res.t21)
        t_dir = t21 / np.linalg.norm(t21)
        assert np.abs(t_est @ t_dir) > 0.999
        # outliers excluded
        inl = np.asarray(res.is_inlier)
        assert inl[bad].mean() < 0.2
        assert int(res.n_inliers) > 150
        # triangulated structure matches scaled ground truth
        scale = np.linalg.norm(t21)
        pts_est = np.asarray(res.points1) * scale
        # compare only inliers; sign of t fixes scale sign
        # (allow global scale factor fit)
        r1n = np.asarray(r1)

    def test_pure_rotation_fails_gracefully(self, rng):
        n = 200
        pts = rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0])
        R21 = np.asarray(so3.exp(jnp.asarray([0.02, -0.1, 0.03], np.float64)))
        p2 = pts @ R21.T  # no translation -> no parallax
        r1 = (pts / pts[:, 2:3]).astype(np.float32)
        r2 = (p2 / p2[:, 2:3]).astype(np.float32)
        res = reconstruct_two_views(
            jnp.asarray(r1), jnp.asarray(r2), jnp.ones(n, bool), jax.random.PRNGKey(1)
        )
        # all points fail the parallax gate -> no init
        assert not bool(res.success)
