"""Sim3 solver and pose-graph optimization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import se3, sim3, so3
from orb_slam3_noted_tpu.geometry.sim3_solver import sim3_ransac
from orb_slam3_noted_tpu.optim.pose_graph import (
    SE3Edges,
    Sim3Edges,
    optimize_pose_graph_4dof,
    optimize_pose_graph_sim3,
)


class TestSim3Ransac:
    def test_recover_with_outliers(self, rng):
        n = 120
        x1 = jnp.asarray(
            (rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0])).astype(np.float32)
        )
        R = so3.exp(jnp.asarray([0.1, 0.3, -0.2], jnp.float32))
        t = jnp.asarray([0.5, -1.0, 0.3], jnp.float32)
        s = 1.4
        x2 = s * (x1 @ R.T) + t + jnp.asarray(
            rng.normal(0, 0.005, size=(n, 3)).astype(np.float32)
        )
        x2_np = np.array(x2)
        bad = rng.choice(n, size=40, replace=False)
        x2_np[bad] += rng.uniform(1, 3, size=(40, 3))
        res = sim3_ransac(
            x1, jnp.asarray(x2_np), jnp.ones(n, bool), jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        assert np.asarray(res.inliers)[bad].sum() == 0
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=5e-3)
        np.testing.assert_allclose(float(res.s), s, atol=0.02)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t), atol=0.05)

    def test_fix_scale(self, rng):
        n = 60
        x1 = jnp.asarray(rng.uniform(-2, 2, size=(n, 3)).astype(np.float32))
        R = so3.exp(jnp.asarray([0.05, -0.1, 0.2], jnp.float32))
        t = jnp.asarray([0.2, 0.1, -0.3], jnp.float32)
        x2 = x1 @ R.T + t
        res = sim3_ransac(
            x1, x2, jnp.ones(n, bool), jax.random.PRNGKey(1), fix_scale=True
        )
        assert bool(res.success)
        assert float(res.s) == 1.0


class TestPoseGraph:
    def test_loop_drift_correction(self, rng):
        """Chain of keyframes with odometry edges + one loop edge.

        Simulates mono scale drift: each odometry measurement is correct, but
        the open-loop estimates accumulate pose+scale error; the loop edge to
        the first keyframe must pull the graph back.
        """
        K = 30
        # ground truth: circle of radius 2 in the xz plane
        Rg, tg, sg = [], [], []
        for k in range(K):
            a = 2 * np.pi * k / K
            Rwk = np.asarray(so3.exp(jnp.asarray([0.0, a, 0.0])))
            twk = np.array([2 * np.sin(a), 0.0, 2 - 2 * np.cos(a)])
            # store world->kf (inverse)
            Rg.append(Rwk.T)
            tg.append(-Rwk.T @ twk)
            sg.append(1.0)
        Rg = np.stack(Rg).astype(np.float32)
        tg = np.stack(tg).astype(np.float32)
        sg = np.asarray(sg, np.float32)

        # exact odometry measurements S_ji between consecutive KFs
        ei, ej, eR, et, es = [], [], [], [], []

        def rel(i, j):
            Si = (jnp.asarray(Rg[i]), jnp.asarray(tg[i]), jnp.asarray(sg[i]))
            Sj = (jnp.asarray(Rg[j]), jnp.asarray(tg[j]), jnp.asarray(sg[j]))
            return sim3.compose(Sj, sim3.inverse(Si))

        for k in range(K - 1):
            Rji, tji, sji = rel(k, k + 1)
            ei.append(k); ej.append(k + 1)
            eR.append(np.asarray(Rji)); et.append(np.asarray(tji)); es.append(float(sji))
        # loop edge last -> first
        Rji, tji, sji = rel(K - 1, 0)
        ei.append(K - 1); ej.append(0)
        eR.append(np.asarray(Rji)); et.append(np.asarray(tji)); es.append(float(sji))

        edges = Sim3Edges(
            i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
            R=jnp.asarray(np.stack(eR), jnp.float32),
            t=jnp.asarray(np.stack(et), jnp.float32),
            s=jnp.asarray(es, jnp.float32),
            weight=jnp.ones(len(ei), jnp.float32),
            valid=jnp.ones(len(ei), bool),
        )

        # drifted initial estimates: integrate odometry with noise + scale creep
        R0 = [Rg[0]]; t0 = [tg[0]]; s0 = [1.0]
        for k in range(K - 1):
            noise = sim3.exp(
                jnp.asarray(
                    np.concatenate([
                        rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3), [0.01],
                    ]).astype(np.float32)
                )
            )
            Sk = (jnp.asarray(R0[-1]), jnp.asarray(t0[-1]), jnp.asarray(s0[-1], jnp.float32))
            Sm = (edges.R[k], edges.t[k], edges.s[k])
            Snext = sim3.compose(noise, sim3.compose(Sm, Sk))
            R0.append(np.asarray(Snext[0])); t0.append(np.asarray(Snext[1])); s0.append(float(Snext[2]))
        R0 = jnp.asarray(np.stack(R0)); t0 = jnp.asarray(np.stack(t0))
        s0 = jnp.asarray(np.asarray(s0, np.float32))

        drift_before = float(jnp.linalg.norm(t0[-1] - tg[-1]))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        Rf, tf, sf, cost = optimize_pose_graph_sim3(R0, t0, s0, edges, fixed)

        # camera centers
        def centers(R, t, s):
            return np.stack([
                -(np.asarray(R[k]).T @ np.asarray(t[k])) / float(s[k]) for k in range(K)
            ])

        c_gt = centers(Rg, tg, sg)
        c_opt = centers(Rf, tf, sf)
        err = np.linalg.norm(c_opt - c_gt, axis=1)
        assert float(cost) < 1e-3, float(cost)
        assert err.max() < 0.05, err.max()
        np.testing.assert_allclose(np.asarray(sf), 1.0, atol=0.02)
        assert drift_before > 0.2  # the test was actually correcting something


class TestPoseGraph4DoF:
    def test_yaw_drift_correction(self, rng):
        """Gravity-aligned loop: drift injected only in yaw+translation
        (what remains unobservable after IMU init) must be fully corrected
        while pitch/roll stay untouched — the contract of the reference's
        ``OptimizeEssentialGraph4DoF`` (`src/Optimizer.cc:7441`)."""
        K = 30
        Rg, tg = [], []
        for k in range(K):
            a = 2 * np.pi * k / K
            # circle in the xy plane (gravity = world z), yawing about z,
            # with a fixed (observable) pitch that must be preserved
            Rwk = np.asarray(
                so3.exp(jnp.asarray([0.0, 0.0, a]))
                @ so3.exp(jnp.asarray([0.15, 0.0, 0.0]))
            )
            twk = np.array([2 * np.sin(a), 2 - 2 * np.cos(a), 0.0])
            Rg.append(Rwk.T)
            tg.append(-Rwk.T @ twk)
        Rg = np.stack(Rg).astype(np.float32)
        tg = np.stack(tg).astype(np.float32)

        def rel(i, j):
            Ti = (jnp.asarray(Rg[i]), jnp.asarray(tg[i]))
            Tj = (jnp.asarray(Rg[j]), jnp.asarray(tg[j]))
            return se3.compose(Tj, se3.inverse(Ti))

        ei, ej, eR, et = [], [], [], []
        for k in range(K - 1):
            Rji, tji = rel(k, k + 1)
            ei.append(k); ej.append(k + 1)
            eR.append(np.asarray(Rji)); et.append(np.asarray(tji))
        Rji, tji = rel(K - 1, 0)
        ei.append(K - 1); ej.append(0)
        eR.append(np.asarray(Rji)); et.append(np.asarray(tji))
        edges = SE3Edges(
            i=jnp.asarray(ei, jnp.int32), j=jnp.asarray(ej, jnp.int32),
            R=jnp.asarray(np.stack(eR), jnp.float32),
            t=jnp.asarray(np.stack(et), jnp.float32),
            weight=jnp.ones(len(ei), jnp.float32),
            valid=jnp.ones(len(ei), bool),
        )

        # drifted estimates: integrate odometry, then perturb each pose in
        # yaw+translation only (world-side), accumulating
        from orb_slam3_noted_tpu.optim.pose_graph import _apply_4dof

        R0 = [Rg[0]]; t0 = [tg[0]]
        for k in range(K - 1):
            Tk = (jnp.asarray(R0[-1]), jnp.asarray(t0[-1]))
            Tm = (edges.R[k], edges.t[k])
            Tn = se3.compose(Tm, Tk)
            d = jnp.asarray(
                np.concatenate([rng.normal(0, 0.02, 1), rng.normal(0, 0.02, 3)]).astype(np.float32)
            )
            Tn = _apply_4dof(Tn, d)
            R0.append(np.asarray(Tn[0])); t0.append(np.asarray(Tn[1]))
        R0 = jnp.asarray(np.stack(R0)); t0 = jnp.asarray(np.stack(t0))

        drift_before = float(jnp.linalg.norm(t0[-1] - tg[-1]))
        fixed = jnp.zeros(K, bool).at[0].set(True)
        Rf, tf, cost = optimize_pose_graph_4dof(R0, t0, edges, fixed)

        c_gt = np.stack([-(Rg[k].T @ tg[k]) for k in range(K)])
        c_opt = np.stack([
            -(np.asarray(Rf[k]).T @ np.asarray(tf[k])) for k in range(K)
        ])
        err = np.linalg.norm(c_opt - c_gt, axis=1)
        assert float(cost) < 1e-3, float(cost)
        assert err.max() < 0.05, err.max()
        assert drift_before > 0.1
        # pitch/roll preserved: world z axis in each kf frame matches GT
        for k in range(0, K, 5):
            g_est = np.asarray(Rf[k]) @ np.array([0.0, 0.0, 1.0])
            g_gt = Rg[k] @ np.array([0.0, 0.0, 1.0])
            assert np.dot(g_est, g_gt) > 0.9999
