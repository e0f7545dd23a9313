"""Bundle adjustment tests: synthetic scenes with known ground truth."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.models import cameras as C
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.optim.ba import BAProblem, bundle_adjust

PIN = C.Camera(C.PINHOLE, (458.654, 457.296, 367.215, 248.375))


def make_ba_scene(rng, n_poses=6, n_points=120, pix_noise=0.3, dtype=np.float32):
    """Cameras on an arc looking at a point cloud; all points seen by all."""
    pts = (rng.uniform(-2, 2, size=(n_points, 3)) + np.array([0, 0, 8.0])).astype(dtype)
    Rs, ts = [], []
    for k in range(n_poses):
        ang = 0.05 * (k - n_poses / 2)
        Rcw = np.asarray(so3.exp(jnp.asarray([0.0, ang, 0.0], dtype)))
        tcw = np.array([0.4 * k - 1.0, 0.02 * k, 0.1 * k], dtype)
        Rs.append(Rcw)
        ts.append(tcw)
    Rs = np.stack(Rs); ts = np.stack(ts)

    pose_idx, point_idx, uvs = [], [], []
    for k in range(n_poses):
        xc = pts @ Rs[k].T + ts[k]
        uv = np.asarray(C.project(PIN, jnp.asarray(xc)))
        pose_idx += [k] * n_points
        point_idx += list(range(n_points))
        uvs.append(uv)
    uv = np.concatenate(uvs) + rng.normal(0, pix_noise, size=(n_poses * n_points, 2))
    O = len(pose_idx)
    obs = factors.ReprojObs(
        pose_idx=jnp.asarray(pose_idx, jnp.int32),
        point_idx=jnp.asarray(point_idx, jnp.int32),
        uv=jnp.asarray(uv.astype(dtype)),
        uv_r=jnp.zeros(O, dtype),
        inv_sigma2=jnp.ones(O, dtype),
        is_stereo=jnp.zeros(O, bool),
        valid=jnp.ones(O, bool),
    )
    return Rs, ts, pts, obs


class TestBundleAdjust:
    def test_recovers_scene(self, rng):
        Rs, ts, pts, obs = make_ba_scene(rng)
        K, M = len(Rs), len(pts)
        # perturb all but the first two poses (gauge anchors) and all points
        R0 = Rs.copy(); t0 = ts.copy()
        for k in range(2, K):
            R0[k] = np.asarray(
                so3.exp(jnp.asarray(rng.normal(0, 0.01, 3).astype(np.float32)))
            ) @ Rs[k]
            t0[k] = ts[k] + rng.normal(0, 0.05, 3)
        p0 = pts + rng.normal(0, 0.08, size=pts.shape).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[:2] = True
        prob = BAProblem(
            Rcw=jnp.asarray(R0.astype(np.float32)), tcw=jnp.asarray(t0.astype(np.float32)),
            points=jnp.asarray(p0.astype(np.float32)), obs=obs,
            pose_fixed=jnp.asarray(fixed), point_fixed=jnp.zeros(M, bool),
        )
        res = bundle_adjust(PIN, prob)
        # anchors untouched
        np.testing.assert_allclose(np.asarray(res.Rcw[:2]), Rs[:2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.tcw[:2]), ts[:2], atol=1e-6)
        # free poses recovered (sub-centimeter at ~8m depth, 0.3px noise)
        np.testing.assert_allclose(np.asarray(res.Rcw[2:]), Rs[2:], atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.tcw[2:]), ts[2:], atol=2e-2)
        err = np.linalg.norm(np.asarray(res.points) - pts, axis=1)
        assert np.median(err) < 0.03
        assert np.asarray(res.inlier).mean() > 0.97

    def test_outlier_observations_rejected(self, rng):
        Rs, ts, pts, obs = make_ba_scene(rng, n_poses=4, n_points=80)
        K, M = len(Rs), len(pts)
        uv = np.array(obs.uv)  # writable copy
        n_bad = 40
        bad = rng.choice(len(uv), size=n_bad, replace=False)
        uv[bad] += rng.uniform(25, 80, size=(n_bad, 2))
        obs = obs._replace(uv=jnp.asarray(uv))
        fixed = np.zeros(K, bool); fixed[:2] = True
        prob = BAProblem(
            Rcw=jnp.asarray(Rs), tcw=jnp.asarray(ts), points=jnp.asarray(pts),
            obs=obs, pose_fixed=jnp.asarray(fixed), point_fixed=jnp.zeros(M, bool),
        )
        res = bundle_adjust(PIN, prob)
        inl = np.asarray(res.inlier)
        assert inl[bad].sum() == 0
        good = np.setdiff1d(np.arange(len(uv)), bad)
        assert inl[good].mean() > 0.95
        # scene kept intact despite outliers
        np.testing.assert_allclose(np.asarray(res.tcw), ts, atol=2e-2)

    def test_fixed_points_not_moved(self, rng):
        Rs, ts, pts, obs = make_ba_scene(rng, n_poses=3, n_points=50)
        K, M = len(Rs), len(pts)
        fixed_pts = np.zeros(M, bool); fixed_pts[:10] = True
        fixed = np.zeros(K, bool); fixed[:2] = True
        # fixed points stay at ground truth (anchors); free ones are perturbed
        p0 = pts + np.where(
            fixed_pts[:, None], 0.0, rng.normal(0, 0.05, size=pts.shape)
        ).astype(np.float32)
        prob = BAProblem(
            Rcw=jnp.asarray(Rs), tcw=jnp.asarray(ts),
            points=jnp.asarray(p0.astype(np.float32)), obs=obs,
            pose_fixed=jnp.asarray(fixed), point_fixed=jnp.asarray(fixed_pts),
        )
        res = bundle_adjust(PIN, prob)
        np.testing.assert_allclose(np.asarray(res.points[:10]), p0[:10], atol=1e-6)
        # depth uncertainty at 8 m with a 0.8 m total baseline and 0.3 px noise
        # is ~5 cm (z^2 sigma/(fx B)); require convergence to that level and a
        # residual chi2 consistent with the injected noise.
        err_free = np.linalg.norm(np.asarray(res.points[10:]) - pts[10:], axis=1)
        assert np.median(err_free) < 0.07
        assert float(res.cost) / int(np.asarray(res.inlier).sum()) < 0.5
