"""Pallas TPU kernels for the feature-frontend hot loops.

The XLA versions of FAST scoring and Gaussian blur lower to long chains of
shifted full-image temporaries (a roll per circle offset / tap) that bounce
through HBM; these kernels keep a whole pyramid level resident in VMEM
(752x480 f32 = 1.4 MB << 16 MB) and do all shifts/minima/taps on-chip —
one HBM read + one write per level.

Falls back to the pure-jnp implementations on non-TPU backends (tests run
on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU-only at runtime; import lazily/safely
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

from orb_slam3_noted_tpu.ops import fast as fast_ref
from orb_slam3_noted_tpu.ops import image as image_ref
from orb_slam3_noted_tpu.ops.fast import ARC, CIRCLE_16


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _roll2(x, dy: int, dx: int):
    """Static 2D circular shift inside a kernel: out[y, x] = in[y+dy, x+dx].

    pltpu.roll only takes non-negative shifts; wrap negatives by the size.
    """
    if dy:
        x = pltpu.roll(x, (-dy) % x.shape[0], 0)
    if dx:
        x = pltpu.roll(x, (-dx) % x.shape[1], 1)
    return x


_FAST_CHUNK = 64  # rows per in-kernel tile; bounds live VMEM temporaries


def _fast_kernel(img_ref, out_ref):
    """img_ref is the 3-row-padded image (H+6, W); out_ref is (H, W).

    Row-chunked so only ~17 chunk-sized temporaries are live at once
    (whole-image form needs ~70 full copies -> VMEM OOM).
    """
    H = out_ref.shape[0]
    r = 0
    while r < H:
        ch = min(_FAST_CHUNK, H - r)
        x = img_ref[r + 3 : r + 3 + ch, :]
        ds = []
        for dy, dx in CIRCLE_16:
            n = img_ref[r + 3 + int(dy) : r + 3 + int(dy) + ch, :]
            if dx:
                n = pltpu.roll(n, (-int(dx)) % n.shape[1], 1)
            ds.append(n - x)

        def windowed_min(vals):
            m = list(vals)
            covered = 1
            while covered < ARC:
                s = min(covered, ARC - covered)
                m = [jnp.minimum(m[k], m[(k + s) % 16]) for k in range(16)]
                covered += s
            return m

        bright = windowed_min(ds)
        dark = windowed_min([-d for d in ds])
        sb = bright[0]
        sd = dark[0]
        for k in range(1, 16):
            sb = jnp.maximum(sb, bright[k])
            sd = jnp.maximum(sd, dark[k])
        out_ref[r : r + ch, :] = jnp.maximum(sb, sd)
        r += ch


@functools.cache
def _fast_pallas_fn(h: int, w: int):
    return jax.jit(
        lambda img: pl.pallas_call(
            _fast_kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.pad(img, ((3, 3), (0, 0))))
    )


def _fast_kernel_b(img_ref, out_ref):
    """Batched FAST: one image per grid step.

    Unlike the 2D kernel (which row-slices its ref), the (1, H+6, W) block
    is loaded as a VALUE and sliced with lax.slice — mosaic requires
    8-aligned slicing on dim 1 of 3D memrefs, which the +-3-row ring reads
    cannot satisfy on a ref.
    """
    H = out_ref.shape[1]
    W = out_ref.shape[2]
    img = img_ref[0]  # (H+6, W) value
    chunks = []
    r = 0
    while r < H:
        ch = min(_FAST_CHUNK, H - r)
        x = jax.lax.slice(img, (r + 3, 0), (r + 3 + ch, W))
        ds = []
        for dy, dx in CIRCLE_16:
            n = jax.lax.slice(img, (r + 3 + int(dy), 0), (r + 3 + int(dy) + ch, W))
            if dx:
                n = pltpu.roll(n, (-int(dx)) % n.shape[1], 1)
            ds.append(n - x)

        def windowed_min(vals):
            m = list(vals)
            covered = 1
            while covered < ARC:
                s = min(covered, ARC - covered)
                m = [jnp.minimum(m[k], m[(k + s) % 16]) for k in range(16)]
                covered += s
            return m

        bright = windowed_min(ds)
        dark = windowed_min([-d for d in ds])
        sb = bright[0]
        sd = dark[0]
        for k in range(1, 16):
            sb = jnp.maximum(sb, bright[k])
            sd = jnp.maximum(sd, dark[k])
        chunks.append(jnp.maximum(sb, sd))
        r += ch
    # one aligned full-block write (unaligned row-slice stores on a 3D ref
    # hit the same mosaic tiling restriction as reads)
    out_ref[0] = jnp.concatenate(chunks, axis=0)


@functools.cache
def _fast_pallas_batched_fn(b: int, h: int, w: int):
    return jax.jit(
        lambda imgs: pl.pallas_call(
            _fast_kernel_b,
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, h + 6, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(jnp.pad(imgs, ((0, 0), (3, 3), (0, 0))))
    )


if _HAS_PALLAS:
    @jax.custom_batching.custom_vmap
    def _fast_tpu(img):
        h, w = img.shape
        return _fast_pallas_fn(h, w)(img)

    @_fast_tpu.def_vmap
    def _fast_tpu_vmap(axis_size, in_batched, imgs):
        # vmap of pallas_call would synthesize an illegal block mapping on
        # mosaic; route batches to an explicit grid over images instead
        b, h, w = imgs.shape
        return _fast_pallas_batched_fn(b, h, w)(imgs), True


def fast_score(img: jnp.ndarray) -> jnp.ndarray:
    """FAST-9/16 score map; Pallas on TPU, jnp fallback elsewhere."""
    if _HAS_PALLAS and _on_tpu():
        return _fast_tpu(img.astype(jnp.float32))
    return fast_ref.fast_score(img)


def _blur_kernel(img_ref, k_ref, out_ref):
    x = img_ref[:]
    k = k_ref[0]  # (7,) taps in SMEM-ish; passed as (1, 7)
    r = 3
    acc = x * k[r]
    for i in range(1, r + 1):
        acc += (_roll2(x, 0, -i) + _roll2(x, 0, i)) * k[r - i]
    acc2 = acc * k[r]
    for i in range(1, r + 1):
        acc2 += (_roll2(acc, -i, 0) + _roll2(acc, i, 0)) * k[r - i]
    out_ref[:] = acc2


@functools.cache
def _blur_pallas_fn(h: int, w: int):
    return jax.jit(
        lambda img, k: pl.pallas_call(
            _blur_kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img, k)
    )


def _blur_kernel_b(img_ref, k_ref, out_ref):
    x = img_ref[0]
    k = k_ref[0]
    r = 3
    acc = x * k[r]
    for i in range(1, r + 1):
        acc += (_roll2(x, 0, -i) + _roll2(x, 0, i)) * k[r - i]
    acc2 = acc * k[r]
    for i in range(1, r + 1):
        acc2 += (_roll2(acc, -i, 0) + _roll2(acc, i, 0)) * k[r - i]
    out_ref[0] = acc2


@functools.cache
def _blur_pallas_batched_fn(b: int, h: int, w: int):
    return jax.jit(
        lambda imgs, k: pl.pallas_call(
            _blur_kernel_b,
            grid=(b,),
            out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 7), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(imgs, k)
    )


if _HAS_PALLAS:
    @jax.custom_batching.custom_vmap
    def _blur_tpu(img, k):
        h, w = img.shape
        return _blur_pallas_fn(h, w)(img, k)

    @_blur_tpu.def_vmap
    def _blur_tpu_vmap(axis_size, in_batched, imgs, k):
        if in_batched[1]:  # kernel taps are identical across the batch
            k = k[0]
        b, h, w = imgs.shape
        return _blur_pallas_batched_fn(b, h, w)(imgs, k), True


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """7x7 separable Gaussian blur (circular edges on TPU — the 3-px border
    is outside the keypoint margin anyway); reflect-pad jnp fallback off-TPU."""
    if _HAS_PALLAS and _on_tpu():
        k = jnp.asarray(image_ref.gaussian_kernel1d(7, sigma))[None, :]
        return _blur_tpu(img.astype(jnp.float32), k)
    return image_ref.gaussian_blur(img, 7, sigma)
