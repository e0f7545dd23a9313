"""Camera model tests: project/unproject roundtrips and analytic Jacobians."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.models import cameras as C

# EuRoC-like pinhole and TUM-VI-like fisheye intrinsics
PIN = C.Camera(C.PINHOLE, (458.654, 457.296, 367.215, 248.375))
KB8 = C.Camera(
    C.KANNALA_BRANDT8,
    (190.978, 190.973, 254.932, 256.897, 0.00348238, 0.000715035, -0.00205324, 0.000202937),
)


def _points(rng, n=256, fov_wide=False):
    # camera-frame points in front of the camera
    if fov_wide:
        d = rng.normal(size=(n, 3))
        d[:, 2] = np.abs(d[:, 2]) * 0.8 + 0.2  # wide angles for fisheye
    else:
        d = rng.normal(size=(n, 3)) * np.array([0.4, 0.3, 0.0]) + np.array([0, 0, 1.0])
    d *= rng.uniform(0.5, 8.0, size=(n, 1))
    return jnp.asarray(d)


class TestPinhole:
    def test_roundtrip(self, rng):
        x = _points(rng)
        uv = C.project(PIN, x)
        ray = C.unproject(PIN, uv)
        np.testing.assert_allclose(ray * x[:, 2:3], x, rtol=1e-6, atol=1e-6)

    def test_jacobian_matches_autodiff(self, rng):
        x = _points(rng, 32)
        J = C.project_jac(PIN, x)
        Jad = jax.vmap(jax.jacfwd(lambda p: C.project(PIN, p)))(x)
        np.testing.assert_allclose(J, Jad, rtol=1e-5, atol=1e-5)


class TestKB8:
    def test_roundtrip(self, rng):
        x = _points(rng, 256, fov_wide=True)
        uv = C.project(KB8, x)
        ray = C.unproject(KB8, uv)
        # ray is z=1-normalized; compare directions
        xn = x / x[:, 2:3]
        np.testing.assert_allclose(ray, xn, rtol=1e-5, atol=1e-5)

    def test_jacobian_matches_autodiff(self, rng):
        x = _points(rng, 32, fov_wide=True)
        J = C.project_jac(KB8, x)
        Jad = jax.vmap(jax.jacfwd(lambda p: C.project(KB8, p)))(x)
        np.testing.assert_allclose(J, Jad, rtol=1e-4, atol=1e-4)

    def test_wide_fov_beyond_90deg(self, rng):
        # fisheye handles points with Z < 0 (FOV > 180 deg not required, but >90 is)
        x = jnp.asarray([[1.0, 0.0, -0.2], [0.0, 1.0, -0.1]])
        uv = C.project(KB8, x)
        assert np.all(np.isfinite(np.asarray(uv)))


class TestRadTan:
    def test_undistort_identity(self, rng):
        uv = jnp.asarray(rng.uniform(0, 640, size=(64, 2)))
        p = PIN.params_array()
        out = C.undistort_points_radtan(p, jnp.zeros(5), uv)
        np.testing.assert_allclose(out, uv, atol=1e-5)

    def test_undistort_inverts_distortion(self, rng):
        # distort normalized points forward, then undistort pixels back
        p = PIN.params_array()
        dist = jnp.asarray([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
        xy = jnp.asarray(rng.uniform(-0.4, 0.4, size=(128, 2)))
        k1, k2, p1, p2, k3 = dist
        x, y = xy[:, 0], xy[:, 1]
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        uv_dist = jnp.stack([xd * p[0] + p[2], yd * p[1] + p[3]], axis=-1)
        uv_true = jnp.stack([x * p[0] + p[2], y * p[1] + p[3]], axis=-1)
        out = C.undistort_points_radtan(p, dist, uv_dist)
        np.testing.assert_allclose(out, uv_true, atol=2e-2)
