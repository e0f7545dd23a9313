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
        # run to convergence: the 8-shard path sums residual blocks in a
        # different order (point-block layout), so mid-optimization LM
        # accept/reject decisions can legitimately diverge — both paths
        # must agree at the MINIMUM, not mid-trajectory
        out1 = distributed_bundle_adjust(PIN, make_mesh(1), *args, n_iters=14)
        out8 = distributed_bundle_adjust(PIN, make_mesh(8), *args, n_iters=14)
        np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out8[1]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out1[2]), np.asarray(out8[2]), atol=2e-3)


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


class TestDistributedPoseGraph:
    def test_sharded_matches_single_device(self, rng):
        """Edge-sharded Sim3 pose graph == the single-device optimizer
        (round-4: distributed essential graph, SURVEY 2.3 north star)."""
        from orb_slam3_noted_tpu.geometry import sim3
        from orb_slam3_noted_tpu.optim.pose_graph import (
            Sim3Edges,
            distributed_pose_graph_sim3,
            optimize_pose_graph_sim3,
        )

        K = 12
        # ground-truth poses on a circle; drifted initial estimates
        Rs, ts = [], []
        for k in range(K):
            Rs.append(np.asarray(so3.exp(jnp.asarray([0.0, 0.25 * k, 0.0]))))
            ts.append(np.array([0.4 * k, 0.0, 0.05 * k], np.float32))
        R_gt = jnp.asarray(np.stack(Rs), jnp.float32)
        t_gt = jnp.asarray(np.stack(ts), jnp.float32)
        s_gt = jnp.ones(K, jnp.float32)
        # edges: chain + a loop edge, measured from ground truth
        ei = list(range(K - 1)) + [0]
        ej = list(range(1, K)) + [K - 1]
        i_arr = jnp.asarray(ei, jnp.int32)
        j_arr = jnp.asarray(ej, jnp.int32)
        Si = (R_gt[i_arr], t_gt[i_arr], s_gt[i_arr])
        Sj = (R_gt[j_arr], t_gt[j_arr], s_gt[j_arr])
        Rr, tr, sr = jax.vmap(lambda a, b: sim3.compose(b, sim3.inverse(a)))(
            Si, Sj
        )
        edges = Sim3Edges(
            i=i_arr, j=j_arr, R=Rr, t=tr, s=sr,
            weight=jnp.ones(len(ei), jnp.float32),
            valid=jnp.ones(len(ei), bool),
        )
        # drift the estimates
        drift = jnp.asarray(
            rng.normal(0, 0.05, size=(K, 3)).astype(np.float32)
        ).at[0].set(0.0)
        t0 = t_gt + drift
        fixed = jnp.zeros(K, bool).at[0].set(True)
        out1 = optimize_pose_graph_sim3(R_gt, t0, s_gt, edges, fixed)
        out8 = distributed_pose_graph_sim3(
            make_mesh(8), R_gt, t0, s_gt, edges, fixed
        )
        np.testing.assert_allclose(
            np.asarray(out1[1]), np.asarray(out8[1]), atol=1e-4
        )
        # and both recover the ground truth
        np.testing.assert_allclose(
            np.asarray(out8[1]), np.asarray(t_gt), atol=5e-3
        )
