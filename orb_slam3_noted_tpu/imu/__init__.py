"""IMU types and on-manifold preintegration (Forster et al.) as a lax.scan."""

from orb_slam3_noted_tpu.imu.preintegration import (  # noqa: F401
    Bias,
    Calib,
    Preintegrated,
    init_preintegrated,
    integrate_measurements,
    delta_rotation,
    delta_velocity,
    delta_position,
    GRAVITY,
)
