"""Dataset loaders, configuration, and trajectory IO."""

from orb_slam3_noted_tpu.io.config import SlamConfig  # noqa: F401
