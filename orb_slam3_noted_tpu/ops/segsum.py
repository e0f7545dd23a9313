"""Segment-sum strategies for TPU.

``jax.ops.segment_sum`` lowers to scatter-add; on TPU (mosaic) scatters
serialize per row and measure ~1 ms per call at our sizes — they dominate
the BA/tracking hot paths.  ``segment_sum_mxu`` reformulates the reduction
as a one-hot matmul, S[s, f] = sum_o 1[seg_o == s] * data[o, f]: the one-hot
operand is fused into the dot, so the MXU streams it — no scatter at all.

``precision='float32'`` uses 3-pass bf16 emulation (exact enough for normal
equations assembly: inputs are f32, accumulation in f32).

Env ``SLAM_SEGSUM=scatter`` forces the scatter path (A/B testing).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_IMPL = os.environ.get("SLAM_SEGSUM", "mxu")


def segment_sum_mxu(data: jnp.ndarray, seg: jnp.ndarray, num_segments: int,
                    precision=jax.lax.Precision.HIGHEST):
    """segment_sum via one-hot matmul on the MXU.

    data: (O, ...) float; seg: (O,) int32 in [0, num_segments).
    Accumulation is always f32; ``precision`` controls operand rounding
    (HIGHEST = exact f32 via multi-pass, DEFAULT = bf16 operands — 6x fewer
    MXU passes, ~0.4% operand rounding; fine for Hessian assembly whose
    steps are cost-checked anyway).
    """
    if _IMPL == "scatter":
        return jax.ops.segment_sum(data, seg, num_segments=num_segments)
    shape = data.shape
    O = shape[0]
    flat = data.reshape(O, -1)
    oh = (
        seg[None, :] == jnp.arange(num_segments, dtype=seg.dtype)[:, None]
    ).astype(flat.dtype)
    out = jax.lax.dot_general(
        oh, flat, (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    return out.reshape((num_segments,) + shape[1:])
