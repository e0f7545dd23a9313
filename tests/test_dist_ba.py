"""Distributed BA on the virtual 8-device CPU mesh (SURVEY §7 phase F entry)."""

import numpy as np
import jax
import jax.numpy as jnp
import sys

from orb_slam3_noted_tpu.parallel import make_mesh, distributed_bundle_adjust
from test_ba import make_ba_scene, PIN

from orb_slam3_noted_tpu.geometry import so3


class TestDistributedBA:
    def test_eight_device_mesh_matches_ground_truth(self, rng):
        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        mesh = make_mesh(8)
        Rs, ts, pts, obs = make_ba_scene(rng, n_poses=6, n_points=100)
        K, M = len(Rs), len(pts)
        R0 = Rs.copy(); t0 = ts.copy()
        for k in range(2, K):
            R0[k] = np.asarray(
                so3.exp(jnp.asarray(rng.normal(0, 0.01, 3).astype(np.float32)))
            ) @ Rs[k]
            t0[k] = ts[k] + rng.normal(0, 0.05, 3)
        p0 = pts + rng.normal(0, 0.05, size=pts.shape).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[:2] = True

        Rf, tf, pf, cost = distributed_bundle_adjust(
            PIN, mesh,
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(t0.astype(np.float32)),
            jnp.asarray(p0.astype(np.float32)), obs,
            jnp.asarray(fixed), jnp.zeros(M, bool),
            n_iters=10,
        )
        np.testing.assert_allclose(np.asarray(Rf[2:]), Rs[2:], atol=6e-3)
        np.testing.assert_allclose(np.asarray(tf[2:]), ts[2:], atol=5e-2)
        err = np.linalg.norm(np.asarray(pf) - pts, axis=1)
        assert np.median(err) < 0.05

    def test_matches_single_device_result(self, rng):
        """Same problem on 1-device and 8-device meshes must agree closely."""
        Rs, ts, pts, obs = make_ba_scene(rng, n_poses=4, n_points=60)
        K, M = len(Rs), len(pts)
        p0 = pts + rng.normal(0, 0.03, size=pts.shape).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[:2] = True
        args = (
            jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(p0.astype(np.float32)),
            obs, jnp.asarray(fixed), jnp.zeros(M, bool),
        )
        out1 = distributed_bundle_adjust(PIN, make_mesh(1), *args, n_iters=5)
        out8 = distributed_bundle_adjust(PIN, make_mesh(8), *args, n_iters=5)
        np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out8[1]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out8[2]), atol=1e-3)


class TestDistributedGBA:
    """Matrix-free Schur/PCG global BA sharded over the mesh."""

    def test_matches_single_device_engine(self, rng):
        from orb_slam3_noted_tpu.optim.ba import BAProblem
        from orb_slam3_noted_tpu.optim.gba import (
            distributed_global_ba,
            global_bundle_adjust,
        )

        Rs, ts, pts, obs = make_ba_scene(rng, n_poses=8, n_points=200)
        K, M = len(Rs), len(pts)
        p0 = (pts + rng.normal(0, 0.04, size=pts.shape)).astype(np.float32)
        t0 = ts.copy()
        t0[2:] += rng.normal(0, 0.03, size=(K - 2, 3)).astype(np.float32)
        fixed = np.zeros(K, bool); fixed[:2] = True
        prob = BAProblem(
            Rcw=jnp.asarray(Rs), tcw=jnp.asarray(t0.astype(np.float32)),
            points=jnp.asarray(p0), obs=obs,
            pose_fixed=jnp.asarray(fixed), point_fixed=jnp.zeros(M, bool),
        )
        single = global_bundle_adjust(PIN, prob, n_iters=6, n_iters_final=3)
        R8, t8, p8, cost8 = distributed_global_ba(
            PIN, make_mesh(8), prob, n_iters=6, n_iters_final=3,
        )
        # both engines converge to the ground-truth scene
        np.testing.assert_allclose(np.asarray(t8[2:]), ts[2:], atol=5e-2)
        err = np.linalg.norm(np.asarray(p8) - pts, axis=1)
        assert np.median(err) < 0.05
        # and agree with each other (same math, psum'd reductions)
        np.testing.assert_allclose(
            np.asarray(single.tcw), np.asarray(t8), atol=1e-3
        )
        assert np.isfinite(float(cost8))
