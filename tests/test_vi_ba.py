"""Visual-inertial BA tests: joint state recovery on synthetic trajectories.

Covers the equivalents of ``Optimizer::LocalInertialBA`` (`/root/reference/
src/Optimizer.cc:3900`) and ``PoseInertialOptimizationLastKeyFrame`` (`:6630`):
perturbed body states (pose, velocity, bias) and landmarks must be recovered
from exact reprojections + preintegrated IMU segments.
"""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.imu import Bias
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE, project
from orb_slam3_noted_tpu.optim import factors
from orb_slam3_noted_tpu.optim.inertial_ba import (
    VIBAProblem,
    no_prior,
    vi_pose_optimization,
    visual_inertial_ba,
)
from orb_slam3_noted_tpu.optim.pose_opt import PoseObs
from orb_slam3_noted_tpu.optim.vi_factors import (
    InertialEdges,
    VIState,
    cam_from_body,
    inertial_edge_residuals,
)

from test_inertial import make_calib, preintegrate_segments, synth_trajectory

CAM = Camera(PINHOLE, (400.0, 400.0, 320.0, 240.0))


def make_problem(n_kf=6, n_pts=96, seed=3, dtype=jnp.float64):
    calib = make_calib()
    kf_R, kf_p, kf_v, segs = synth_trajectory(n_kf=n_kf, kf_dt=0.4)
    pre = preintegrate_segments(segs, calib)
    st_true = VIState(
        Rwb=jnp.asarray(kf_R, dtype), twb=jnp.asarray(kf_p, dtype),
        vel=jnp.asarray(kf_v, dtype),
        bg=jnp.zeros((n_kf, 3), dtype), ba=jnp.zeros((n_kf, 3), dtype),
    )
    rng = np.random.default_rng(seed)
    # landmarks in front of the whole trajectory (cameras look roughly +z)
    pts = jnp.asarray(
        rng.uniform(-3, 3, (n_pts, 3)) + np.array([0.0, 0.0, 7.0]), dtype
    )
    Rcw, tcw = cam_from_body(st_true, calib)
    pose_idx = jnp.repeat(jnp.arange(n_kf, dtype=jnp.int32), n_pts)
    point_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), n_kf)
    xc = jnp.einsum("oij,oj->oi", Rcw[pose_idx], pts[point_idx]) + tcw[pose_idx]
    uv = project(CAM, xc)
    O = n_kf * n_pts
    obs = factors.ReprojObs(
        pose_idx=pose_idx, point_idx=point_idx, uv=uv,
        uv_r=jnp.zeros(O, dtype), inv_sigma2=jnp.ones(O, dtype),
        is_stereo=jnp.zeros(O, bool), valid=xc[:, 2] > 0.2,
    )
    edges = InertialEdges(
        i=jnp.arange(n_kf - 1, dtype=jnp.int32),
        j=jnp.arange(1, n_kf, dtype=jnp.int32),
        preint=pre, valid=jnp.ones(n_kf - 1, bool),
    )
    return calib, st_true, pts, obs, edges


class TestInertialEdges:
    def test_zero_residual_at_truth(self):
        calib, st, pts, obs, edges = make_problem()
        r, Ji, Jj = inertial_edge_residuals(st, edges)
        # whitened residuals at the exact trajectory: only midpoint
        # discretization error remains, a few sigma at these tiny noise
        # densities (raw error ~1e-3 rad/m, verified in test_inertial)
        assert float(jnp.abs(r).max()) < 5.0


class TestVisualInertialBA:
    def test_recovers_perturbed_window(self):
        calib, st_true, pts, obs, edges = make_problem()
        n_kf = st_true.twb.shape[0]
        rng = np.random.default_rng(0)
        dtype = st_true.twb.dtype

        def perturb(x, s, lo=2):
            n = np.zeros(x.shape)
            n[lo:] = rng.normal(0, s, n[lo:].shape)
            return x + jnp.asarray(n, dtype)

        dR = jnp.stack([
            so3.exp(jnp.asarray(
                rng.normal(0, 0.02 if k >= 2 else 0.0, 3), dtype))
            for k in range(n_kf)
        ])
        st0 = VIState(
            Rwb=jnp.einsum("kij,kjl->kil", st_true.Rwb, dR),
            twb=perturb(st_true.twb, 0.05),
            vel=perturb(st_true.vel, 0.1),
            bg=perturb(st_true.bg, 0.002),
            ba=perturb(st_true.ba, 0.02),
        )
        pts0 = pts + jnp.asarray(rng.normal(0, 0.03, pts.shape), dtype)
        prob = VIBAProblem(
            state=st0, points=pts0, obs=obs, edges=edges,
            pose_fixed=jnp.asarray([True, True] + [False] * (n_kf - 2)),
            point_fixed=jnp.zeros(pts.shape[0], bool),
            prior=no_prior(dtype),
        )
        res = visual_inertial_ba(
            CAM, calib, prob, n_iters=6, n_iters_final=6
        )
        st = res.state
        # the optimum is discretization-limited: the midpoint-integrated
        # preintegration residual is non-zero at the exact trajectory (its
        # information is huge at these noise densities), pulling states a
        # couple of millimetres off ground truth
        np.testing.assert_allclose(
            np.asarray(st.twb), np.asarray(st_true.twb), atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(st.vel), np.asarray(st_true.vel), atol=2e-2
        )
        rot_err = np.array([
            float(jnp.linalg.norm(so3.log(st.Rwb[k].T @ st_true.Rwb[k])))
            for k in range(n_kf)
        ])
        assert rot_err.max() < 2e-3, rot_err
        assert int(jnp.sum(res.inlier)) > 0.9 * obs.uv.shape[0]

    def test_fixed_states_unchanged(self):
        calib, st_true, pts, obs, edges = make_problem(n_kf=4)
        dtype = st_true.twb.dtype
        prob = VIBAProblem(
            state=st_true, points=pts, obs=obs, edges=edges,
            pose_fixed=jnp.ones(4, bool),
            point_fixed=jnp.ones(pts.shape[0], bool),
            prior=no_prior(dtype),
        )
        res = visual_inertial_ba(CAM, calib, prob, n_iters=2, n_iters_final=2)
        np.testing.assert_allclose(
            np.asarray(res.state.twb), np.asarray(st_true.twb), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(res.points), np.asarray(pts), atol=1e-12
        )


class TestVIPoseOptimization:
    def test_recovers_frame_state(self):
        calib, st_true, pts, obs, edges = make_problem(n_kf=2, n_pts=128)
        dtype = st_true.twb.dtype
        anchor = jax.tree_util.tree_map(lambda x: x[0], st_true)
        frame_true = jax.tree_util.tree_map(lambda x: x[1], st_true)
        rng = np.random.default_rng(1)
        frame0 = VIState(
            Rwb=frame_true.Rwb @ so3.exp(jnp.asarray([0.02, -0.03, 0.01], dtype)),
            twb=frame_true.twb + jnp.asarray([0.05, -0.04, 0.06], dtype),
            vel=frame_true.vel + jnp.asarray(rng.normal(0, 0.1, 3), dtype),
            bg=frame_true.bg, ba=frame_true.ba,
        )
        pre1 = jax.tree_util.tree_map(lambda x: x[0], edges.preint)
        # observations of frame 1 only
        sel = np.asarray(obs.pose_idx) == 1
        N = int(sel.sum())
        pobs = PoseObs(
            uv=obs.uv[sel], uv_r=jnp.zeros(N, dtype),
            inv_sigma2=jnp.ones(N, dtype),
            is_stereo=jnp.zeros(N, bool), valid=obs.valid[sel],
        )
        res = vi_pose_optimization(
            CAM, calib, anchor, frame0, pre1,
            pts[obs.point_idx[sel]], pobs,
        )
        np.testing.assert_allclose(
            np.asarray(res.twb), np.asarray(frame_true.twb), atol=2e-3
        )
        rot_err = float(jnp.linalg.norm(so3.log(res.Rwb.T @ frame_true.Rwb)))
        assert rot_err < 1e-3
        np.testing.assert_allclose(
            np.asarray(res.vel), np.asarray(frame_true.vel), atol=5e-2
        )
        assert int(res.n_inliers) > 100
