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


# ---------------------------------------------------------------------------
# rBRIEF sampling kernel
#
# The XLA form is a 512-point random gather per keypoint — latency-bound at
# ~14 ns/element on TPU (PROFILE_r04.md), ~70% of the whole extraction
# pipeline.  Here each keypoint reads a (64, 64) VMEM window around itself
# (dynamic slice, no HBM gather) and selects its 512 samples with two
# one-hot contractions: rows via a (512, 64) @ (64, 64) MXU matmul, the
# lane via a masked sum — turning a pointer chase into dense compute.
# ---------------------------------------------------------------------------

_BRIEF_KB = 8     # keypoints per grid step
# window rows: the rotated pattern spans <= 44 px; 64 = 44 + 8-alignment
# slack (mosaic requires sublane dynamic-slice starts to be multiples of 8)
_BRIEF_WH = 64
# window cols: lane dynamic-slice starts must be multiples of 128, so the
# window is 256 wide — anchored such that the 44-px span always fits
_BRIEF_WW = 256


def _brief_kernel(y0_ref, x0_ref, gy_ref, gx_ref, img_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (512, _BRIEF_WW), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (512, _BRIEF_WH), 1)
    vals_all = []
    for k in range(_BRIEF_KB):
        y0 = pl.multiple_of(y0_ref[k, 0], 8)
        x0 = pl.multiple_of(x0_ref[k, 0], 128)
        win = img_ref[pl.ds(y0, _BRIEF_WH), pl.ds(x0, _BRIEF_WW)]
        oy = (sub == (gy_ref[k] - y0)[:, None]).astype(jnp.float32)
        # HIGHEST precision: the default f32 matmul truncates through bf16
        # passes — one-hot SELECTION must reproduce the f32 pixel exactly
        # or comparisons flip vs the XLA path
        rows = jax.lax.dot_general(
            oy, win, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        ox = lane == (gx_ref[k] - x0)[:, None]
        vals_all.append(jnp.sum(jnp.where(ox, rows, 0.0), axis=1))  # (512,)
    vals = jnp.stack(vals_all)                                 # (KB, 512)
    # raw comparison bits; packing into uint32 words happens OUTSIDE the
    # kernel (mosaic cannot reshape across the lane dimension)
    out_ref[:] = (vals[:, :256] < vals[:, 256:]).astype(jnp.int32)


@functools.cache
def _brief_pallas_fn(b: int, kpad: int, h: int, w: int):
    grid = (b, kpad // _BRIEF_KB)

    return jax.jit(
        lambda y0, x0, gy, gx, img: pl.pallas_call(
            _brief_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b, kpad, 256), jnp.int32),
            in_specs=[
                pl.BlockSpec((None, _BRIEF_KB, 1), lambda ib, ik: (ib, ik, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, _BRIEF_KB, 1), lambda ib, ik: (ib, ik, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, _BRIEF_KB, 512),
                             lambda ib, ik: (ib, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, _BRIEF_KB, 512),
                             lambda ib, ik: (ib, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, h, w), lambda ib, ik: (ib, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, _BRIEF_KB, 256),
                                   lambda ib, ik: (ib, ik, 0),
                                   memory_space=pltpu.VMEM),
        )(y0, x0, gy, gx, img)
    )


def _brief_pad_shape(H: int, W: int) -> tuple[int, int]:
    """Padded image shape such that every window origin stays ALIGNED.

    Clipping an origin to H-64 / W-256 would break the sublane/lane
    alignment mosaic requires (and silently mis-load); instead the image
    is zero-padded so the largest possible aligned origin still has a full
    window: Hpad >= max_y0 + 64, Wpad >= max_x0 + 256.  The pad region is
    never selected (sample coordinates are clipped inside the real image).
    """
    hpad = max((H - 29) // 8 * 8 + _BRIEF_WH, _BRIEF_WH)
    wpad = max((W - 97) // 128 * 128 + _BRIEF_WW, _BRIEF_WW)
    return max(hpad, H), max(wpad, W)


def _brief_prep(img_blur, gy, gx):
    """Window origins for one image's coordinate table.

    y0 is a multiple of 8, x0 a multiple of 128 (mosaic dynamic-slice
    alignment); the (64, 256) window covers the <=44-px rotated-pattern
    span from any anchor (y0 in [ymid-35, ymid-28], x0 in
    (xmid-224, xmid-96], both >= 0 after the max)."""
    ymid = (jnp.min(gy, axis=-1) + jnp.max(gy, axis=-1)) // 2
    xmid = (jnp.min(gx, axis=-1) + jnp.max(gx, axis=-1)) // 2
    y0 = jnp.maximum((ymid - 28) // 8 * 8, 0).astype(jnp.int32)
    x0 = jnp.maximum((xmid - 96) // 128 * 128, 0).astype(jnp.int32)
    return y0, x0


if _HAS_PALLAS:
    @jax.custom_batching.custom_vmap
    def _brief_tpu(img, gy, gx):
        h, w = img.shape
        kpad = gy.shape[0]
        y0, x0 = _brief_prep(img, gy, gx)
        out = _brief_pallas_fn(1, kpad, h, w)(
            y0[None, :, None], x0[None, :, None],
            gy[None], gx[None], img[None],
        )
        return out[0]

    @_brief_tpu.def_vmap
    def _brief_tpu_vmap(axis_size, in_batched, imgs, gy, gx):
        b, h, w = imgs.shape
        kpad = gy.shape[1]
        y0, x0 = _brief_prep(imgs, gy, gx)
        out = _brief_pallas_fn(b, kpad, h, w)(
            y0[:, :, None], x0[:, :, None], gy, gx, imgs,
        )
        return out, True


def brief_sample_tpu(img_blur: jnp.ndarray, gy: jnp.ndarray,
                     gx: jnp.ndarray) -> jnp.ndarray | None:
    """(K, 8) packed rBRIEF words from precomputed sample coordinates.

    gy/gx: (K, 512) absolute pixel coordinates (already rotated + clipped,
    so each keypoint's samples span <= 44 px and always fit the (64, 64)
    window anchored at their midpoint).  Returns None off-TPU (callers
    fall back to the XLA gather); images smaller than the window (tiny
    pyramid levels) also fall back.
    """
    if not (_HAS_PALLAS and _on_tpu()):
        return None
    H, W = img_blur.shape
    hpad, wpad = _brief_pad_shape(H, W)
    if (hpad, wpad) != (H, W):
        img_blur = jnp.pad(img_blur, ((0, hpad - H), (0, wpad - W)))
    K = gy.shape[0]
    kpad = -(-K // _BRIEF_KB) * _BRIEF_KB
    if kpad != K:
        gy = jnp.pad(gy, ((0, kpad - K), (0, 0)))
        gx = jnp.pad(gx, ((0, kpad - K), (0, 0)))
    bits = _brief_tpu(
        img_blur.astype(jnp.float32),
        gy.astype(jnp.int32), gx.astype(jnp.int32),
    )[:K].astype(jnp.uint32)                        # (K, 256) raw bits
    words = bits.reshape(K, 8, 32) << jnp.arange(32, dtype=jnp.uint32)[
        None, None, :
    ]
    return jnp.sum(words, axis=-1, dtype=jnp.uint32)  # (K, 8)


# ---------------------------------------------------------------------------
# Stereo SAD kernel
#
# ``match_stereo``'s subpixel refinement gathers an 11x11 left patch and an
# 11x21 right strip per keypoint — ~422k randomly-addressed elements per
# frame, latency-bound at ~14 ns/element like the pre-Pallas rBRIEF gather
# (≈6 ms/frame, round-5 profile).  Same cure: per keypoint, dynamic-slice
# ALIGNED (16, 256) windows of the pyramid atlases out of VMEM, select the
# 11 patch rows with a one-hot MXU contraction, lane-align the right strip
# to the left window with a one-hot shift matmul, and evaluate all 11 SAD
# shifts as static lane-rolls + masked reductions — dense compute instead
# of a pointer chase.
# ---------------------------------------------------------------------------

_SAD_KB = 16     # keypoints per grid step
_SAD_WH = 24     # window rows (11 + 7 max in-window offset + alignment)
_SAD_WW = 256    # window cols (lane origins must be multiples of 128)


def _sad_kernel(y0_ref, x0l_ref, x0r_ref, dy_ref, cl_ref, cr_ref,
                al_ref, ar_ref, out_ref, win_ref, sem_ref):
    """Batched SAD: one grid step evaluates 8 keypoints.

    The pyramid atlases stay in HBM (memory_space=ANY — both sides in VMEM
    OOM'd at 752x480x8-level scale); each keypoint's aligned (24, 256)
    windows are DMA'd into a small VMEM bank, then THREE large one-hot MXU
    contractions (row-select, left/right lane-select) and 11 static
    lane-rolls + masked reductions evaluate all shifts — dense compute
    instead of a ~422k-element random gather.  Output rows are PER PATCH
    ROW — the final 11-row sum per keypoint happens outside (XLA reduce).
    """
    KB = _SAD_KB
    R88 = KB * 11
    ib = pl.program_id(0)

    # DMA all 2*KB windows into the bank, then wait
    for k in range(KB):
        y0 = pl.multiple_of(y0_ref[k, 0], 8)
        x0l = pl.multiple_of(x0l_ref[k, 0], 128)
        x0r = pl.multiple_of(x0r_ref[k, 0], 128)
        cpl = pltpu.make_async_copy(
            al_ref.at[ib, pl.ds(y0, _SAD_WH), pl.ds(x0l, _SAD_WW)],
            win_ref.at[k, :, 0:_SAD_WW],
            sem_ref.at[2 * k],
        )
        cpr = pltpu.make_async_copy(
            ar_ref.at[ib, pl.ds(y0, _SAD_WH), pl.ds(x0r, _SAD_WW)],
            win_ref.at[k, :, _SAD_WW:],
            sem_ref.at[2 * k + 1],
        )
        cpl.start()
        cpr.start()
    for k in range(KB):
        y0 = pl.multiple_of(y0_ref[k, 0], 8)
        x0l = pl.multiple_of(x0l_ref[k, 0], 128)
        x0r = pl.multiple_of(x0r_ref[k, 0], 128)
        pltpu.make_async_copy(
            al_ref.at[ib, pl.ds(y0, _SAD_WH), pl.ds(x0l, _SAD_WW)],
            win_ref.at[k, :, 0:_SAD_WW],
            sem_ref.at[2 * k],
        ).wait()
        pltpu.make_async_copy(
            ar_ref.at[ib, pl.ds(y0, _SAD_WH), pl.ds(x0r, _SAD_WW)],
            win_ref.at[k, :, _SAD_WW:],
            sem_ref.at[2 * k + 1],
        ).wait()

    WIN = win_ref[:].astype(jnp.float32).reshape(KB * _SAD_WH, 2 * _SAD_WW)

    # one-hot row selection: out row i = k*11 + r picks bank row
    # k*24 + dy_k + r.  The per-row target is built on a THIN (R88, 1)
    # column (8 masked adds over 88 elements, not 88x192) and compared
    # against the lane iota once — mask construction was half the kernel
    i0c = jax.lax.broadcasted_iota(jnp.int32, (R88, 1), 0)
    k_ofc = i0c // 11
    r_ofc = i0c - k_ofc * 11
    dy_ofc = jnp.zeros((R88, 1), jnp.int32)
    for k in range(KB):
        dy_ofc = dy_ofc + jnp.where(k_ofc == k, dy_ref[k, 0], 0)
    rowtarget = k_ofc * _SAD_WH + dy_ofc + r_ofc           # (R88, 1)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (R88, KB * _SAD_WH), 1)
    OY = (i1 == rowtarget).astype(jnp.float32)
    ROWS = jax.lax.dot_general(
        OY, WIN, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                            # (88, 512)
    L = jax.lax.slice(ROWS, (0, 0), (R88, _SAD_WW))
    R = jax.lax.slice(ROWS, (0, _SAD_WW), (R88, 2 * _SAD_WW))

    # lane selection into per-keypoint 32-lane blocks:
    # SEL[c, k*32+t] = (c == base_k + t); every row keeps only its own
    # keypoint's block via the block-diagonal mask below
    WSEL = KB * 32
    c0 = jax.lax.broadcasted_iota(jnp.int32, (_SAD_WW, WSEL), 0)
    c1r = jax.lax.broadcasted_iota(jnp.int32, (1, WSEL), 1)
    kb_ofr = c1r // 32
    t_ofr = c1r - kb_ofr * 32
    cl_ofr = jnp.zeros((1, WSEL), jnp.int32)
    cr_ofr = jnp.zeros((1, WSEL), jnp.int32)
    for k in range(KB):
        sel = kb_ofr == k
        cl_ofr = cl_ofr + jnp.where(sel, cl_ref[k, 0], 0)
        cr_ofr = cr_ofr + jnp.where(sel, cr_ref[k, 0], 0)
    CL = (c0 == cl_ofr + t_ofr).astype(jnp.float32)
    CR = (c0 == cr_ofr + t_ofr).astype(jnp.float32)
    Lsel = jax.lax.dot_general(
        L, CL, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                            # (88, 256)
    Rsel = jax.lax.dot_general(
        R, CR, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (R88, WSEL), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R88, WSEL), 0)
    blockdiag = (lane // 32 == row // 11) & (lane - (lane // 32) * 32 < 11)
    lane_out = jax.lax.broadcasted_iota(jnp.int32, (R88, 128), 1)
    acc = jnp.zeros((R88, 128), jnp.float32)
    for inc in range(11):
        Ar = pltpu.roll(Rsel, (-inc) % WSEL, 1) if inc else Rsel
        d = jnp.where(blockdiag, jnp.abs(Lsel - Ar), 0.0)
        rowsum = jnp.sum(d, axis=1, keepdims=True)       # (88, 1)
        acc = acc + rowsum * (lane_out == inc).astype(jnp.float32)
    out_ref[:] = acc


@functools.cache
def _sad_pallas_fn(b: int, kpad: int, h: int, w: int):
    grid = (b, kpad // _SAD_KB)
    spec_s = pl.BlockSpec((None, _SAD_KB, 1), lambda ib, ik: (ib, ik, 0),
                          memory_space=pltpu.SMEM)
    # atlases stay in HBM (ANY); the kernel DMAs per-keypoint windows
    spec_img = pl.BlockSpec(memory_space=pltpu.ANY)
    return jax.jit(
        lambda y0, x0l, x0r, dy, cl, cr, al, ar: pl.pallas_call(
            _sad_kernel,
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b, kpad * 11, 128), jnp.float32),
            in_specs=[spec_s, spec_s, spec_s, spec_s, spec_s, spec_s,
                      spec_img, spec_img],
            out_specs=pl.BlockSpec((None, _SAD_KB * 11, 128),
                                   lambda ib, ik: (ib, ik, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_SAD_KB, _SAD_WH, 2 * _SAD_WW), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2 * _SAD_KB,)),
            ],
        )(y0, x0l, x0r, dy, cl, cr, al, ar)
    )


def _sad_prep(cv, cu, cur, h_atlas, w_atlas):
    """Aligned window origins + in-window offsets for the SAD kernel.

    cv: atlas row of the keypoint (level row + level row-offset);
    cu/cur: level-coordinate columns of the left keypoint / right match.
    Returns int32 (y0, x0l, x0r, dy, cl, s) with y0 % 8 == 0 and
    x0l/x0r % 128 == 0, every window inside the padded atlas.
    """
    y0 = jnp.clip((cv - 5) // 8 * 8, 0, ((h_atlas - _SAD_WH) // 8) * 8)
    dy = cv - 5 - y0
    max_x0 = ((w_atlas - _SAD_WW) // 128) * 128
    x0l = jnp.clip((cu - 5) // 128 * 128, 0, max_x0)
    x0r = jnp.clip((cur - 10) // 128 * 128, 0, max_x0)
    cl = cu - 5 - x0l
    cr = cur - 10 - x0r
    f = lambda a: a.astype(jnp.int32)
    return f(y0), f(x0l), f(x0r), f(dy), f(cl), f(cr)


if _HAS_PALLAS:
    @jax.custom_batching.custom_vmap
    def _sad_tpu(atlas_l, atlas_r, y0, x0l, x0r, dy, cl, cr):
        h, w = atlas_l.shape
        kpad = y0.shape[0]
        out = _sad_pallas_fn(1, kpad, h, w)(
            y0[None, :, None], x0l[None, :, None], x0r[None, :, None],
            dy[None, :, None], cl[None, :, None], cr[None, :, None],
            atlas_l[None], atlas_r[None],
        )
        return out[0]

    @_sad_tpu.def_vmap
    def _sad_tpu_vmap(axis_size, in_batched, atlas_l, atlas_r,
                      y0, x0l, x0r, dy, cl, cr):
        b, h, w = atlas_l.shape
        kpad = y0.shape[1]
        out = _sad_pallas_fn(b, kpad, h, w)(
            y0[:, :, None], x0l[:, :, None], x0r[:, :, None],
            dy[:, :, None], cl[:, :, None], cr[:, :, None],
            atlas_l, atlas_r,
        )
        return out, True


def sad_stereo_tpu(atlas_l, atlas_r, cv, cu, cur):
    """(K, 11) SAD values for the 11 horizontal shifts, or None off-TPU.

    atlas_l/atlas_r: level-stacked pyramid images (callers pad so every
    aligned window fits — rows to a multiple of 8 plus 16, cols to a
    multiple of 128 plus 256).  cv: atlas row (level row + row offset);
    cu/cur: level columns of the left keypoint / Hamming-matched right
    keypoint.  Interior keypoints (the FAST margin guarantees > 16 px)
    reproduce the XLA gather path exactly; border windows differ only in
    clamp behaviour and are rejected downstream anyway.
    """
    if not (_HAS_PALLAS and _on_tpu()):
        return None
    H, W = atlas_l.shape
    K = cv.shape[0]
    y0, x0l, x0r, dy, cl, cr = _sad_prep(cv, cu, cur, H, W)
    kpad = -(-K // _SAD_KB) * _SAD_KB
    if kpad != K:
        pad = lambda a: jnp.pad(a, (0, kpad - K))
        y0, x0l, x0r, dy, cl, cr = map(pad, (y0, x0l, x0r, dy, cl, cr))
    rows = _sad_tpu(atlas_l, atlas_r, y0, x0l, x0r, dy, cl, cr)
    # kernel emits per-PATCH-ROW sums: (kpad*11, 128) -> (K, 11, 11) -> sum
    sads = rows[:, :11].reshape(kpad, 11, 11).sum(axis=1)
    return sads[:K]
