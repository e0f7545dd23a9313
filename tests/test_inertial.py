"""Inertial optimization tests: IMU init recovers scale/gravity/bias."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu import Bias, Calib, integrate_measurements, GRAVITY
from orb_slam3_noted_tpu.optim.inertial import (
    apply_scaled_rotation,
    gravity_vec,
    imu_residual,
    inertial_init,
)


def make_calib():
    return Calib(
        Rbc=jnp.eye(3, dtype=jnp.float64), tbc=jnp.zeros(3, jnp.float64),
        cov_ng=jnp.asarray(1e-6), cov_na=jnp.asarray(1e-4),
        cov_walk_g=jnp.asarray(1e-9), cov_walk_a=jnp.asarray(1e-6),
    )


def synth_trajectory(n_kf=12, kf_dt=0.25, imu_hz=200, bg=None, ba=None, seed=0):
    """Analytic smooth trajectory + exact IMU measurements (midpoint FD)."""
    bg = np.zeros(3) if bg is None else bg
    ba = np.zeros(3) if ba is None else ba
    g = np.array([0.0, 0.0, -GRAVITY])

    def pos(t):
        # strong excitation: accelerations of several m/s^2 make scale and
        # accel bias observable quickly (as in the reference's hand-held
        # initialization scenarios)
        return np.array(
            [1.2 * np.sin(2.1 * t), 0.9 * np.cos(1.7 * t), 0.5 * np.sin(2.7 * t)]
        )

    def rot(t):
        return np.asarray(so3.exp(jnp.asarray(
            [0.25 * np.sin(0.8 * t), 0.3 * t * 0.2, 0.2 * np.cos(0.5 * t)]
        )))

    eps = 1e-5

    def vel(t):
        return (pos(t + eps) - pos(t - eps)) / (2 * eps)

    def acc(t):
        return (pos(t + eps) - 2 * pos(t) + pos(t - eps)) / (eps * eps)

    def omega(t):
        dR = rot(t).T @ rot(t + eps)
        return np.asarray(so3.log(jnp.asarray(dR))) / eps

    dt = 1.0 / imu_hz
    segments = []
    kf_R, kf_p, kf_v = [], [], []
    for k in range(n_kf):
        t0 = k * kf_dt
        kf_R.append(rot(t0)); kf_p.append(pos(t0)); kf_v.append(vel(t0))
        if k == n_kf - 1:
            break
        ts = t0 + dt * (np.arange(int(kf_dt * imu_hz)) + 0.5)
        acc_b = np.stack([rot(t).T @ (acc(t) - g) + ba for t in ts])
        gyr_b = np.stack([omega(t) + bg for t in ts])
        segments.append((acc_b, gyr_b, np.full(len(ts), dt)))
    return (
        np.stack(kf_R), np.stack(kf_p), np.stack(kf_v), segments,
    )


def preintegrate_segments(segments, calib, bias=None):
    bias = bias if bias is not None else Bias.zero(jnp.float64)
    ps = [
        integrate_measurements(
            bias, jnp.asarray(a), jnp.asarray(w), jnp.asarray(d), calib
        )
        for a, w, d in segments
    ]
    return jax.tree_util.tree_map(lambda *x: jnp.stack(x), *ps)


class TestImuResidual:
    def test_zero_on_exact_trajectory(self):
        calib = make_calib()
        kf_R, kf_p, kf_v, segs = synth_trajectory(n_kf=4)
        pre = preintegrate_segments(segs, calib)
        g = jnp.asarray([0.0, 0.0, -GRAVITY])
        for k in range(3):
            p = jax.tree_util.tree_map(lambda x: x[k], pre)
            r = imu_residual(
                jnp.asarray(kf_R[k]), jnp.asarray(kf_p[k]), jnp.asarray(kf_v[k]),
                jnp.asarray(kf_R[k + 1]), jnp.asarray(kf_p[k + 1]), jnp.asarray(kf_v[k + 1]),
                jnp.zeros(3), jnp.zeros(3), p, g,
            )
            assert float(jnp.abs(r).max()) < 2e-3, np.asarray(r)


class TestInertialInit:
    def test_recover_scale_gravity_bias(self):
        calib = make_calib()
        bg_true = np.array([0.004, -0.006, 0.003])
        ba_true = np.array([0.05, -0.03, 0.08])
        kf_R, kf_p, kf_v, segs = synth_trajectory(n_kf=14, bg=bg_true, ba=ba_true)
        pre = preintegrate_segments(segs, calib)
        s_true = 2.7  # visual map is 1/s_true of metric
        twb_vis = kf_p / s_true
        res = inertial_init(
            jnp.asarray(kf_R), jnp.asarray(twb_vis), pre,
            jnp.ones(len(kf_R) - 1, bool),
            prior_g=1.0, prior_a=1.0, n_iters=30,
        )
        assert abs(float(res.scale) - s_true) / s_true < 0.03, float(res.scale)
        np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.ba), ba_true, atol=0.05)
        # gravity should stay aligned (visual world == true world here)
        np.testing.assert_allclose(
            np.asarray(res.g_world), [0, 0, -GRAVITY], atol=0.15
        )
        # velocities (metric) close to analytic
        v_metric = float(res.scale) * np.asarray(res.velocities)
        np.testing.assert_allclose(v_metric, kf_v, atol=0.1)

    def test_rotated_gravity_detected(self):
        """Visual world tilted 10 deg: init must find the gravity direction."""
        calib = make_calib()
        kf_R, kf_p, kf_v, segs = synth_trajectory(n_kf=12)
        pre = preintegrate_segments(segs, calib)
        # tilt the visual world: x_vis = R_tilt x_true
        R_tilt = np.asarray(so3.exp(jnp.asarray([0.17, -0.05, 0.0])))
        kf_R_vis = np.einsum("ij,kjl->kil", R_tilt, kf_R)
        twb_vis = kf_p @ R_tilt.T / 1.8
        res = inertial_init(
            jnp.asarray(kf_R_vis), jnp.asarray(twb_vis), pre,
            jnp.ones(len(kf_R) - 1, bool), prior_g=1.0, prior_a=1.0, n_iters=30,
        )
        g_est = np.asarray(res.g_world)
        g_expected = R_tilt @ np.array([0, 0, -GRAVITY])
        np.testing.assert_allclose(g_est, g_expected, atol=0.2)
        assert abs(float(res.scale) - 1.8) / 1.8 < 0.05

    def test_apply_scaled_rotation(self, rng):
        K, M = 5, 40
        Rcw = np.stack([np.asarray(so3.exp(jnp.asarray(rng.normal(0, 0.3, 3)))) for _ in range(K)])
        tcw = rng.normal(size=(K, 3))
        pts = rng.normal(size=(M, 3))
        Ryw = np.asarray(so3.exp(jnp.asarray([0.1, 0.2, -0.05])))
        s = 2.0
        Rn, tn, pn = apply_scaled_rotation(
            jnp.asarray(Rcw), jnp.asarray(tcw), jnp.asarray(pts),
            jnp.asarray(Ryw), jnp.asarray(s),
        )
        # invariant: camera-frame coordinates of points scale by s exactly
        for k in range(K):
            old = pts @ Rcw[k].T + tcw[k]
            new = np.asarray(pn) @ np.asarray(Rn[k]).T + np.asarray(tn[k])
            np.testing.assert_allclose(new, s * old, rtol=1e-5, atol=1e-5)
