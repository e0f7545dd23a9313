"""Sim3 solver and pose-graph optimization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import sim3, so3
from orb_slam3_noted_tpu.geometry.sim3_solver import sim3_ransac
from orb_slam3_noted_tpu.optim.pose_graph import Sim3Edges, optimize_pose_graph_sim3


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
