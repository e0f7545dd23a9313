"""Typed SLAM configuration.

One typed config object replacing the reference's per-sequence OpenCV YAML
parsing spread over ``Tracking::Parse{Cam,ORB,IMU}ParamFile``
(`/root/reference/src/Tracking.cc:490,1022,1106`).  A YAML loader for the
reference's exact file schema lives in :mod:`orb_slam3_noted_tpu.io.yaml_compat`
so existing dataset configs keep working.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE


@dataclass(frozen=True)
class SlamConfig:
    # --- camera ---
    camera: Camera = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
    width: int = 752
    height: int = 480
    fps: float = 20.0
    bf: float = 0.0                  # baseline x fx (stereo), reference "Camera.bf"
    th_depth: float = 35.0           # close/far stereo point threshold ("ThDepth")
    dist_coeffs: tuple = ()          # rad-tan (k1,k2,p1,p2[,k3]); empty = none

    # --- ORB extractor (reference YAML ORBextractor.*) ---
    n_features: int = 1200
    n_levels: int = 8
    scale_factor: float = 1.2
    ini_th_fast: float = 20.0
    min_th_fast: float = 7.0

    # --- map capacities (static shapes) ---
    max_keyframes: int = 256
    max_map_points: int = 16384

    # --- tracking policy ---
    min_tracked_points: int = 15     # lost below this
    kf_min_interval: int = 0         # min frames between KFs
    kf_max_interval: int = 30        # force KF after this many frames
    kf_tracked_ratio: float = 0.9    # new KF when tracked < ratio * ref visible
    local_window: int = 10           # covisible KFs for local map / local BA

    # --- matching ---
    nn_ratio_track: float = 0.9
    search_radius_px: float = 15.0

    # --- loop closing ---
    enable_loop_closing: bool = False
    vocab_words: int = 1024
    loop_min_inliers: int = 25

    @property
    def level_sigma2(self):
        return tuple(
            (self.scale_factor ** (2 * i)) for i in range(self.n_levels)
        )
