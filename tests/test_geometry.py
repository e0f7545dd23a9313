"""Golden tests for the Lie-group geometry core (SURVEY §7 phase A)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3, se3, sim3
from orb_slam3_noted_tpu.geometry.horn import horn_sim3
from orb_slam3_noted_tpu.geometry.triangulation import triangulate_dlt


def random_w(rng, n, max_angle=3.0):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = rng.uniform(1e-8, max_angle, size=(n, 1))
    return (axis * ang).astype(np.float64)


class TestSO3:
    def test_exp_properties(self, rng):
        w = jnp.asarray(random_w(rng, 64))
        R = so3.exp(w)
        eye = jnp.eye(3, dtype=R.dtype)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.tile(eye, (64, 1, 1)), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-9)

    def test_exp_small_angle(self, rng):
        w = jnp.asarray(random_w(rng, 16, max_angle=1e-7))
        R = so3.exp(w)
        np.testing.assert_allclose(R, jnp.eye(3) + so3.hat(w), atol=1e-12)

    def test_log_exp_roundtrip(self, rng):
        w = jnp.asarray(random_w(rng, 128, max_angle=3.1))
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_log_near_pi(self, rng):
        w = jnp.asarray(random_w(rng, 32, max_angle=1.0))
        w = w / jnp.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 1e-5)
        R = so3.exp(w)
        w2 = so3.log(R)
        # Sign of axis is ambiguous exactly at pi; compare rotations.
        np.testing.assert_allclose(so3.exp(w2), R, atol=1e-5)

    def test_right_jacobian_fd(self, rng):
        w = jnp.asarray(random_w(rng, 8, max_angle=2.5))
        Jr = so3.right_jacobian(w)
        eps = 1e-7
        for k in range(3):
            dw = np.zeros(3)
            dw[k] = eps
            lhs = so3.exp(w + dw)
            rhs = so3.exp(w) @ so3.exp(jnp.einsum("nij,j->ni", Jr, jnp.asarray(dw)))
            np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_inverse_right_jacobian(self, rng):
        w = jnp.asarray(random_w(rng, 32, max_angle=2.5))
        prod = so3.right_jacobian(w) @ so3.inverse_right_jacobian(w)
        np.testing.assert_allclose(prod, np.tile(np.eye(3), (32, 1, 1)), atol=1e-8)

    def test_quat_roundtrip(self, rng):
        w = jnp.asarray(random_w(rng, 64, max_angle=3.1))
        R = so3.exp(w)
        R2 = so3.from_quat(so3.to_quat(R))
        np.testing.assert_allclose(R2, R, atol=1e-8)

    def test_normalize(self, rng):
        w = jnp.asarray(random_w(rng, 8))
        R = so3.exp(w) + 1e-4 * jnp.asarray(rng.normal(size=(8, 3, 3)))
        Rn = so3.normalize(R)
        np.testing.assert_allclose(
            Rn @ jnp.swapaxes(Rn, -1, -2), np.tile(np.eye(3), (8, 1, 1)), atol=1e-9
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(Rn)), 1.0, atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(
            np.concatenate([rng.normal(size=(64, 3)), random_w(rng, 64, 3.0)], axis=-1)
        )
        T = se3.exp(xi)
        np.testing.assert_allclose(se3.log(T), xi, atol=1e-6)

    def test_compose_inverse(self, rng):
        xi1 = jnp.asarray(np.concatenate([rng.normal(size=(16, 3)), random_w(rng, 16)], -1))
        xi2 = jnp.asarray(np.concatenate([rng.normal(size=(16, 3)), random_w(rng, 16)], -1))
        T1, T2 = se3.exp(xi1), se3.exp(xi2)
        T = se3.compose(T1, T2)
        x = jnp.asarray(rng.normal(size=(16, 3)))
        np.testing.assert_allclose(
            se3.apply(T, x), se3.apply(T1, se3.apply(T2, x)), atol=1e-9
        )
        Tinv = se3.inverse(T)
        np.testing.assert_allclose(se3.apply(Tinv, se3.apply(T, x)), x, atol=1e-8)

    def test_matrix_roundtrip(self, rng):
        xi = jnp.asarray(np.concatenate([rng.normal(size=(8, 3)), random_w(rng, 8)], -1))
        T = se3.exp(xi)
        R, t = se3.from_matrix(se3.to_matrix(T))
        np.testing.assert_allclose(R, T[0], atol=1e-12)
        np.testing.assert_allclose(t, T[1], atol=1e-12)


class TestSim3:
    def _random_xi(self, rng, n):
        return jnp.asarray(
            np.concatenate(
                [
                    rng.normal(size=(n, 3)),
                    random_w(rng, n, 2.5),
                    rng.uniform(-0.7, 0.7, size=(n, 1)),
                ],
                axis=-1,
            )
        )

    def test_exp_log_roundtrip(self, rng):
        xi = self._random_xi(rng, 64)
        S = sim3.exp(xi)
        np.testing.assert_allclose(sim3.log(S), xi, atol=1e-5)

    def test_compose_inverse_action(self, rng):
        S1 = sim3.exp(self._random_xi(rng, 16))
        S2 = sim3.exp(self._random_xi(rng, 16))
        x = jnp.asarray(rng.normal(size=(16, 3)))
        S = sim3.compose(S1, S2)
        np.testing.assert_allclose(
            sim3.apply(S, x), sim3.apply(S1, sim3.apply(S2, x)), atol=1e-7
        )
        Sinv = sim3.inverse(S)
        np.testing.assert_allclose(sim3.apply(Sinv, sim3.apply(S, x)), x, atol=1e-7)

    def test_se3_consistency(self, rng):
        """sigma = 0 must reduce Sim3 exp to SE3 exp."""
        xi6 = jnp.asarray(np.concatenate([rng.normal(size=(16, 3)), random_w(rng, 16)], -1))
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
        R7, t7, s7 = sim3.exp(xi7)
        R6, t6 = se3.exp(xi6)
        np.testing.assert_allclose(s7, 1.0, atol=1e-12)
        np.testing.assert_allclose(R7, R6, atol=1e-9)
        np.testing.assert_allclose(t7, t6, atol=1e-7)


class TestHorn:
    def test_recover_similarity(self, rng):
        R = so3.exp(jnp.asarray(random_w(rng, 1)))[0]
        t = jnp.asarray(rng.normal(size=3))
        s = jnp.asarray(1.7)
        x = jnp.asarray(rng.normal(size=(50, 3)))
        y = s * (x @ R.T) + t
        Re, te, se = horn_sim3(x, y)
        np.testing.assert_allclose(Re, R, atol=1e-8)
        np.testing.assert_allclose(te, t, atol=1e-8)
        np.testing.assert_allclose(se, s, atol=1e-8)

    def test_fix_scale_and_weights(self, rng):
        R = so3.exp(jnp.asarray(random_w(rng, 1)))[0]
        t = jnp.asarray(rng.normal(size=3))
        x = jnp.asarray(rng.normal(size=(60, 3)))
        y = x @ R.T + t
        # poison half the points, mask them out with weights
        y = y.at[30:].add(jnp.asarray(rng.normal(size=(30, 3)) * 10))
        w = jnp.concatenate([jnp.ones(30), jnp.zeros(30)])
        Re, te, se = horn_sim3(x, y, weights=w, fix_scale=True)
        np.testing.assert_allclose(se, 1.0)
        np.testing.assert_allclose(Re, R, atol=1e-7)
        np.testing.assert_allclose(te, t, atol=1e-7)


class TestTriangulation:
    def test_perfect_observations(self, rng):
        n = 40
        pts = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)) + np.array([0, 0, 4.0]))
        R21 = so3.exp(jnp.asarray([0.02, -0.3, 0.01]))
        t21 = jnp.asarray([-0.5, 0.02, 0.05])
        ray1 = pts / pts[:, 2:3]
        p2 = pts @ R21.T + t21
        ray2 = p2 / p2[:, 2:3]
        rec = triangulate_dlt(ray1, ray2, R21, t21)
        np.testing.assert_allclose(rec, pts, atol=1e-6)
