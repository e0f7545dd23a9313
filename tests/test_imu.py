"""IMU preintegration tests (SURVEY §7 phase C) vs an independent numpy model."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_noted_tpu.imu import (
    Bias, Calib, init_preintegrated, integrate_measurements,
    delta_rotation, delta_velocity, delta_position, GRAVITY,
)
from orb_slam3_noted_tpu.imu.preintegration import predict_state
from orb_slam3_noted_tpu.geometry import so3


def make_calib(dtype=np.float64):
    return Calib(
        Rbc=jnp.eye(3, dtype=dtype),
        tbc=jnp.zeros(3, dtype=dtype),
        cov_ng=jnp.asarray(2.89e-6, dtype=dtype),   # (1.7e-4 * sqrt(200))^2-ish
        cov_na=jnp.asarray(4.0e-4, dtype=dtype),
        cov_walk_g=jnp.asarray(3.8e-9, dtype=dtype),
        cov_walk_a=jnp.asarray(9.0e-6, dtype=dtype),
    )


def numpy_preintegrate(acc, gyr, dts, bg, ba, cov_ng, cov_na, cov_wg, cov_wa):
    """Straightforward scalar-loop implementation of Forster preintegration
    (independent of the jax code paths; used as the golden model)."""
    def hat(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    def expso3(p):
        th = np.linalg.norm(p)
        W = hat(p)
        if th < 1e-12:
            return np.eye(3) + W
        return np.eye(3) + np.sin(th) / th * W + (1 - np.cos(th)) / th**2 * W @ W

    def rightJ(p):
        th = np.linalg.norm(p)
        W = hat(p)
        if th < 1e-12:
            return np.eye(3)
        return (
            np.eye(3)
            - (1 - np.cos(th)) / th**2 * W
            + (th - np.sin(th)) / th**3 * W @ W
        )

    dR = np.eye(3); dV = np.zeros(3); dP = np.zeros(3)
    JRg = np.zeros((3, 3)); JVg = np.zeros((3, 3)); JVa = np.zeros((3, 3))
    JPg = np.zeros((3, 3)); JPa = np.zeros((3, 3))
    C = np.zeros((15, 15))
    for a_m, w_m, dt in zip(acc, gyr, dts):
        if dt == 0:
            continue
        a = a_m - ba
        w = w_m - bg
        Wa = hat(a)
        dP = dP + dV * dt + 0.5 * dR @ a * dt * dt
        dV = dV + dR @ a * dt
        JPa = JPa + JVa * dt - 0.5 * dR * dt * dt
        JPg = JPg + JVg * dt - 0.5 * dt * dt * dR @ Wa @ JRg
        JVa = JVa - dR * dt
        JVg = JVg - dt * dR @ Wa @ JRg
        dRi = expso3(w * dt)
        Jr = rightJ(w * dt)
        A = np.eye(9); B = np.zeros((9, 6))
        A[0:3, 0:3] = dRi.T
        A[3:6, 0:3] = -dt * dR @ Wa
        A[6:9, 0:3] = -0.5 * dt * dt * dR @ Wa
        A[6:9, 3:6] = np.eye(3) * dt
        B[0:3, 0:3] = Jr * dt
        B[3:6, 3:6] = dR * dt
        B[6:9, 3:6] = 0.5 * dR * dt * dt
        Nga = np.diag([cov_ng] * 3 + [cov_na] * 3)
        C[:9, :9] = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        C[9:15, 9:15] += np.diag([cov_wg] * 3 + [cov_wa] * 3)
        dR = dR @ dRi
        JRg = dRi.T @ JRg - Jr * dt
    return dict(dR=dR, dV=dV, dP=dP, JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa, C=C)


class TestPreintegration:
    def test_constant_gyro(self):
        calib = make_calib()
        n = 100
        w = np.array([0.1, -0.2, 0.3])
        acc = np.zeros((n, 3)); gyr = np.tile(w, (n, 1)); dts = np.full(n, 0.005)
        p = integrate_measurements(
            Bias.zero(jnp.float64), jnp.asarray(acc), jnp.asarray(gyr),
            jnp.asarray(dts), calib,
        )
        np.testing.assert_allclose(p.dR, so3.exp(jnp.asarray(w * 0.5)), atol=1e-9)
        np.testing.assert_allclose(float(p.dT), 0.5, atol=1e-12)

    def test_matches_numpy_golden(self, rng):
        calib = make_calib()
        n = 57
        acc = rng.normal(size=(n, 3)) * 2 + np.array([0, 0, 9.81])
        gyr = rng.normal(size=(n, 3)) * 0.5
        dts = rng.uniform(0.004, 0.006, size=n)
        bg = np.array([0.01, -0.02, 0.005]); ba = np.array([-0.05, 0.1, 0.02])
        p = integrate_measurements(
            Bias(jnp.asarray(bg), jnp.asarray(ba)),
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), calib,
        )
        g = numpy_preintegrate(
            acc, gyr, dts, bg, ba,
            float(calib.cov_ng), float(calib.cov_na),
            float(calib.cov_walk_g), float(calib.cov_walk_a),
        )
        np.testing.assert_allclose(p.dR, g["dR"], atol=1e-9)
        np.testing.assert_allclose(p.dV, g["dV"], atol=1e-9)
        np.testing.assert_allclose(p.dP, g["dP"], atol=1e-9)
        for k in ["JRg", "JVg", "JVa", "JPg", "JPa"]:
            np.testing.assert_allclose(getattr(p, k), g[k], atol=1e-9, err_msg=k)
        np.testing.assert_allclose(p.C, g["C"], atol=1e-12)

    def test_padding_noop(self, rng):
        calib = make_calib()
        n = 20
        acc = rng.normal(size=(n, 3)); gyr = rng.normal(size=(n, 3)) * 0.2
        dts = np.full(n, 0.005)
        p1 = integrate_measurements(
            Bias.zero(jnp.float64), jnp.asarray(acc), jnp.asarray(gyr),
            jnp.asarray(dts), calib,
        )
        acc_p = np.concatenate([acc, np.ones((13, 3))])
        gyr_p = np.concatenate([gyr, np.ones((13, 3))])
        dts_p = np.concatenate([dts, np.zeros(13)])
        p2 = integrate_measurements(
            Bias.zero(jnp.float64), jnp.asarray(acc_p), jnp.asarray(gyr_p),
            jnp.asarray(dts_p), calib,
        )
        for k in ["dT", "dR", "dV", "dP", "JRg", "JVg", "JVa", "JPg", "JPa", "C"]:
            np.testing.assert_allclose(getattr(p2, k), getattr(p1, k), atol=1e-12, err_msg=k)

    def test_bias_correction_first_order(self, rng):
        calib = make_calib()
        n = 50
        acc = rng.normal(size=(n, 3)) + np.array([0, 0, 9.81])
        gyr = rng.normal(size=(n, 3)) * 0.3
        dts = np.full(n, 0.005)
        b0 = Bias.zero(jnp.float64)
        p0 = integrate_measurements(b0, jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), calib)
        db = 1e-4
        b1 = Bias(jnp.asarray([db, -db, db]), jnp.asarray([-db, db, db]))
        p1 = integrate_measurements(b1, jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), calib)
        # first-order corrected deltas from p0 must match reintegration closely
        np.testing.assert_allclose(delta_rotation(p0, b1), p1.dR, atol=1e-6)
        np.testing.assert_allclose(delta_velocity(p0, b1), p1.dV, atol=1e-5)
        np.testing.assert_allclose(delta_position(p0, b1), p1.dP, atol=1e-5)

    def test_predict_state_free_fall(self):
        calib = make_calib()
        # measured acc == 0 (free fall), no rotation
        n = 40
        acc = np.zeros((n, 3)); gyr = np.zeros((n, 3)); dts = np.full(n, 0.01)
        p = integrate_measurements(
            Bias.zero(jnp.float64), jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), calib
        )
        R1 = jnp.eye(3, dtype=jnp.float64)
        t1 = jnp.zeros(3, dtype=jnp.float64)
        v1 = jnp.asarray([1.0, 0.0, 0.0])
        R2, t2, v2 = predict_state(R1, t1, v1, p, Bias.zero(jnp.float64))
        T = 0.4
        np.testing.assert_allclose(R2, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(v2, [1.0, 0.0, -GRAVITY * T], atol=1e-9)
        np.testing.assert_allclose(t2, [T, 0.0, -0.5 * GRAVITY * T * T], atol=1e-9)

    def test_stationary_measures_gravity(self):
        calib = make_calib()
        # body at rest: accelerometer measures +g upward reaction
        n = 40
        acc = np.tile([0.0, 0.0, GRAVITY], (n, 1)); gyr = np.zeros((n, 3))
        dts = np.full(n, 0.01)
        p = integrate_measurements(
            Bias.zero(jnp.float64), jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts), calib
        )
        R1 = jnp.eye(3, dtype=jnp.float64); t1 = jnp.zeros(3, dtype=jnp.float64)
        v1 = jnp.zeros(3, dtype=jnp.float64)
        R2, t2, v2 = predict_state(R1, t1, v1, p, Bias.zero(jnp.float64))
        np.testing.assert_allclose(v2, np.zeros(3), atol=1e-9)
        np.testing.assert_allclose(t2, np.zeros(3), atol=1e-9)
