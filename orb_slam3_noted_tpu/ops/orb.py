"""ORB extraction: IC-angle orientation, rBRIEF descriptors, full pyramid.

TPU-native re-design of `/root/reference/src/ORBextractor.cc`:

- Orientation (``IC_Angle``, `:452-477`): instead of per-keypoint patch loops,
  the intensity moments m10/m01 are computed densely for the whole level as
  two 31x31 cross-correlations (MXU-friendly), then sampled at keypoints.
  The circular patch mask reproduces OpenCV's ``umax`` table exactly.
- Descriptors (``computeOrbDescriptor``, `:1115-1120`): the 256 learned point
  pairs (:mod:`orb_pattern`) are rotated by the keypoint angle, rounded, and
  gathered from the Gaussian-blurred level; bits pack into 8 uint32 words.
- The pyramid driver (``operator()``, `:1060-1150`) becomes
  :func:`extract_orb`: per-level dense FAST + grid distribution
  (:mod:`fast`), orientation, descriptors, with keypoint coordinates
  rescaled to level 0.

Outputs are fixed-size (sum of per-level budgets) with validity masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_noted_tpu.ops import fast as fast_ops
from orb_slam3_noted_tpu.ops import image as image_ops
from orb_slam3_noted_tpu.ops import pallas_kernels as pk
from orb_slam3_noted_tpu.ops.orb_pattern import BIT_PATTERN_31

HALF_PATCH = 15


def _umax_table() -> np.ndarray:
    """OpenCV's quarter-circle span table for the IC-angle patch.

    Reproduces the construction in the ORB extractor ctor (symmetrized
    Bresenham circle of radius 15) so the circular mask is bit-identical to
    OpenCV's, which matters for descriptor/vocabulary compatibility.
    """
    umax = np.zeros(HALF_PATCH + 2, dtype=np.int64)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax[: HALF_PATCH + 1]


def _moment_kernels() -> tuple[np.ndarray, np.ndarray]:
    """(31, 31) kernels K10 (x-weights) and K01 (y-weights) over the circle."""
    umax = _umax_table()
    size = 2 * HALF_PATCH + 1
    k10 = np.zeros((size, size), dtype=np.float32)
    k01 = np.zeros((size, size), dtype=np.float32)
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        span = int(umax[abs(dy)])
        for dx in range(-span, span + 1):
            k10[dy + HALF_PATCH, dx + HALF_PATCH] = dx
            k01[dy + HALF_PATCH, dx + HALF_PATCH] = dy
    return k10, k01


_K10, _K01 = _moment_kernels()


def ic_angle_maps(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dense intensity moments (m10, m01) via row prefix sums — O(1)/pixel.

    img: (H, W) float32 -> two (H, W) maps. Keypoint angle = atan2(m01, m10).

    The circular-patch moments of `src/ORBextractor.cc:452-477` are separable
    by row: with u(|dy|) the quarter-circle span table, per row
    ``B_w(x) = sum_{|dx|<=w} I(x+dx)`` and
    ``T_w(x) = sum_{|dx|<=w} dx * I(x+dx)`` follow from two x-cumsums
    (``T_w = w*(C1(x+w)+C1(x-w-1)) - C2(x+w-1) + C2(x-w-1)``), and
    ``m01 = sum_dy dy*B_{u}(y+dy)``, ``m10 = sum_dy T_{u}(y+dy)`` are 61
    shifted adds.  This replaces a dense 31x31 conv (961 taps/pixel, ~17 ms
    per level on TPU) with ~1 ms of VPU work.  The image is centred (-128)
    first so the prefix sums stay small enough for exact f32 arithmetic
    (the circular mask is symmetric, so the moments are shift-invariant).
    """
    dt = img.dtype
    H, W = img.shape[-2], img.shape[-1]
    P = HALF_PATCH + 1  # 16: covers x+w (w<=15) and x-w-1 reads
    umax = _umax_table()
    p = jnp.pad(img - jnp.asarray(128.0, dt), ((P, P), (P, P)))
    C1 = jnp.cumsum(p, axis=1)
    C2 = jnp.cumsum(C1, axis=1)
    Hp = H + 2 * P

    def shx(A, k):  # out(y, x) = A(y, x+k); full padded height, x in [0, W)
        return jax.lax.slice(A, (0, P + k), (Hp, P + k + W))

    Bw, Tw = {}, {}
    for w in sorted({int(v) for v in umax}):
        c1p, c1m = shx(C1, w), shx(C1, -w - 1)
        Bw[w] = c1p - c1m
        Tw[w] = w * (c1p + c1m) - shx(C2, w - 1) + shx(C2, -w - 1)

    m10 = jnp.zeros((H, W), dt)
    m01 = jnp.zeros((H, W), dt)
    for dy in range(-HALF_PATCH, HALF_PATCH + 1):
        w = int(umax[abs(dy)])
        m10 = m10 + jax.lax.slice(Tw[w], (P + dy, 0), (P + dy + H, W))
        if dy:
            m01 = m01 + dy * jax.lax.slice(Bw[w], (P + dy, 0), (P + dy + H, W))
    return m10, m01


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Orientation (radians) for keypoints xy (K, 2) at this level."""
    m10, m01 = ic_angle_maps(img)
    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


# Pattern as float (x, y) pairs: (256, 2) and (256, 2)
_P1 = BIT_PATTERN_31[:, 0:2].astype(np.float32)  # (x1, y1)
_P2 = BIT_PATTERN_31[:, 2:4].astype(np.float32)  # (x2, y2)


def brief_descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF: (K, 8) uint32 descriptors.

    img_blur: (H, W) blurred level; xy: (K, 2) level coords; angle: (K,) rad.
    Matches the reference sampling (`src/ORBextractor.cc` GET_VALUE):
    offset' = round(R(angle) @ offset), bit = I(p+o1) < I(p+o2).
    """
    h, w = img_blur.shape
    a = jnp.cos(angle)[:, None]  # (K, 1)
    b = jnp.sin(angle)[:, None]
    pall = jnp.asarray(np.concatenate([_P1, _P2], 0))  # (512, 2)

    # rotated sample coordinates for all 512 pattern points
    px, py = pall[None, :, 0], pall[None, :, 1]
    rx = jnp.round(px * a - py * b).astype(jnp.int32)  # (K, 512)
    ry = jnp.round(px * b + py * a).astype(jnp.int32)
    gx = jnp.clip(xy[:, 0:1].astype(jnp.int32) + rx, 0, w - 1)
    gy = jnp.clip(xy[:, 1:2].astype(jnp.int32) + ry, 0, h - 1)

    # Pallas sampling kernel on TPU: each keypoint reads a VMEM window and
    # selects its 512 samples with one-hot contractions — the XLA gather is
    # latency-bound at ~14 ns/element and dominates extraction
    # (PROFILE_r04.md).  Comparisons stay on the f32 blur — OpenCV compares
    # the rounded 8U blur, but rounding first measurably degrades
    # association on depth-seeded maps (RGB-D max ATE 0.10 -> 0.147 m).
    out = pk.brief_sample_tpu(img_blur, gy, gx)
    if out is not None:
        return out

    # XLA fallback: flat 1-D gather (~20% faster than the 2-axis form)
    flat = img_blur.reshape(-1)
    vals = jnp.take(flat, gy * w + gx, axis=0)  # (K, 512)
    bits = (vals[:, :256] < vals[:, 256:]).astype(jnp.uint32)
    k = bits.shape[0]
    words = bits.reshape(k, 8, 32) << jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(words, axis=-1, dtype=jnp.uint32)  # (K, 8)


class FrameFeatures(NamedTuple):
    """Fixed-size multi-level feature set for one image.

    Equivalent of the reference Frame's keypoint/descriptor vectors
    (`/root/reference/include/Frame.h:231-244`), padded to a static total.
    Coordinates are at level-0 (full) resolution, as the reference stores
    them after its per-level rescale.
    """

    xy: jnp.ndarray        # (N, 2) float32
    level: jnp.ndarray     # (N,) int32 pyramid octave
    angle: jnp.ndarray     # (N,) float32 radians
    response: jnp.ndarray  # (N,) float32 FAST score
    desc: jnp.ndarray      # (N, 8) uint32 packed rBRIEF
    valid: jnp.ndarray     # (N,) bool


def scale_factors(n_levels: int = 8, scale_factor: float = 1.2) -> np.ndarray:
    return scale_factor ** np.arange(n_levels, dtype=np.float64)


def level_sigma2(n_levels: int = 8, scale_factor: float = 1.2) -> np.ndarray:
    """Per-level variance weights (reference ``mvLevelSigma2``)."""
    return (scale_factors(n_levels, scale_factor) ** 2).astype(np.float32)


@partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale_factor", "th_high", "th_low"),
)
def extract_orb(
    img: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    th_high: float = 20.0,
    th_low: float = 7.0,
) -> FrameFeatures:
    """Full ORB pipeline for one grayscale image (H, W) float32 [0, 255]."""
    levels = image_ops.build_pyramid(img, n_levels, scale_factor)
    return extract_from_pyramid(
        tuple(levels), n_features=n_features, n_levels=n_levels,
        scale_factor=scale_factor, th_high=th_high, th_low=th_low,
    )


def extract_from_pyramid(
    levels: tuple,
    n_features: int = 1200,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    th_high: float = 20.0,
    th_low: float = 7.0,
) -> FrameFeatures:
    """ORB extraction from a prebuilt pyramid (shared with stereo matching,
    which needs the same per-level images for SAD refinement)."""
    img = levels[0]
    budgets = fast_ops.level_budgets(n_features, n_levels, scale_factor)
    sf = scale_factors(n_levels, scale_factor)

    outs = []
    for lvl, (level_img, budget) in enumerate(zip(levels, budgets)):
        if budget <= 0:
            continue
        score = pk.fast_score(level_img)
        kps = fast_ops.detect_level(
            score, n_out=budget, th_high=th_high, th_low=th_low, border=16
        )
        ang = ic_angles(level_img, kps.xy)
        blur = pk.gaussian_blur7(level_img, 2.0)
        desc = brief_descriptors(blur, kps.xy, ang)
        # Exact level->0 mapping: the resize uses half-pixel centers and the
        # ACTUAL per-axis ratio W0/Wl (rounded level sizes drift from the
        # nominal 1.2^l by ~0.1%, which is a visible disparity bias).
        h0, w0 = img.shape[-2], img.shape[-1]
        hl, wl = level_img.shape[-2], level_img.shape[-1]
        ax = jnp.asarray([w0 / wl, h0 / hl], img.dtype)
        outs.append(
            FrameFeatures(
                xy=(kps.xy + 0.5) * ax - 0.5,
                level=jnp.full((budget,), lvl, dtype=jnp.int32),
                angle=ang,
                response=kps.score,
                desc=desc,
                valid=kps.valid,
            )
        )

    return FrameFeatures(
        xy=jnp.concatenate([o.xy for o in outs]),
        level=jnp.concatenate([o.level for o in outs]),
        angle=jnp.concatenate([o.angle for o in outs]),
        response=jnp.concatenate([o.response for o in outs]),
        desc=jnp.concatenate([o.desc for o in outs]),
        valid=jnp.concatenate([o.valid for o in outs]),
    )


@partial(
    jax.jit,
    static_argnames=("n_features", "n_levels", "scale_factor", "th_high", "th_low"),
)
def extract_orb_batch(
    imgs: jnp.ndarray,
    n_features: int = 1200,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    th_high: float = 20.0,
    th_low: float = 7.0,
) -> FrameFeatures:
    """ORB extraction for a (B, H, W) image batch — vmapped dense kernels.

    The per-image path runs ~40 small per-level kernels; batching frames
    turns each into one B-wide kernel, amortizing dispatch latency and
    filling the VPU.  This is the throughput-mode analogue of the
    reference's per-frame dual extraction threads (`src/Frame.cc:119-122`),
    generalized to whole frame batches (SURVEY §2.3 "data parallelism
    within a frame").
    """
    fn = partial(
        extract_orb,
        n_features=n_features, n_levels=n_levels, scale_factor=scale_factor,
        th_high=th_high, th_low=th_low,
    )
    return jax.vmap(fn)(imgs)
