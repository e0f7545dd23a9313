"""The optimization backend: one batched LM/Schur engine.

Replaces the reference's 25 g2o-based ``Optimizer::*`` entry points
(`/root/reference/src/Optimizer.cc`, 7.8k LoC over g2o's 16k LoC) with a
single family of batched JAX solvers:

- :mod:`factors` — batched residual/Jacobian evaluation for reprojection
  (mono/stereo, pinhole/fisheye) and robust Huber weighting.
- :mod:`pose_opt` — motion-only pose optimization with the reference's
  4-round outlier re-classification (``PoseOptimization``).
- :mod:`ba` — bundle adjustment with Schur-complement marginalization of
  landmarks (``LocalBundleAdjustment`` / ``GlobalBundleAdjustemnt``).
- :mod:`pose_graph` — Sim3/SE3 essential-graph optimization
  (``OptimizeEssentialGraph*``) (see also :mod:`sim3_opt` for ``OptimizeSim3``).
- :mod:`inertial` — IMU initialization (``InertialOptimization``) and the
  map gravity-align/rescale step (``ApplyScaledRotation``).
- :mod:`vi_factors` — batched visual-inertial factor library
  (``EdgeInertial``/``EdgeGyroRW``/``EdgeAccRW``/``EdgePriorPoseImu`` and
  body-frame reprojection, `include/G2oTypes.h`).
- :mod:`inertial_ba` — joint visual-inertial LM/Schur engine covering
  ``LocalInertialBA``/``FullInertialBA`` and the motion-only
  ``PoseInertialOptimizationLastKeyFrame/LastFrame``.

Everything is static-shape: observations are padded arrays with validity
masks; fixed vertices are handled by zeroing their Jacobian columns and
pinning their diagonal blocks.
"""

from orb_slam3_noted_tpu.optim.robust import huber_weight, CHI2_MONO, CHI2_STEREO  # noqa: F401
