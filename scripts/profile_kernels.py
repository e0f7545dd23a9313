"""Per-kernel TPU profile harness (PROFILE_r04.md source).

Times the extraction/matching pipeline pieces with forced synchronization
(np.asarray pulls — plain block_until_ready under the axon tunnel can
return before results materialize).  Run on the real chip:

    python scripts/profile_kernels.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.ops import pallas_kernels as pk
from orb_slam3_noted_tpu.ops import fast as F
from orb_slam3_noted_tpu.ops.stereo import match_stereo
from orb_slam3_noted_tpu.pipeline import tracking as T

W, H, NF, B = 752, 480, 1200, 16
cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
cfg = SlamConfig(camera=cam, width=W, height=H, n_features=NF,
                 max_keyframes=64, max_map_points=8192)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
imgs_u8 = imgs.astype(jnp.uint8)


def bench(name, fn, *a, n=5):
    t0 = time.time()
    out = fn(*a)
    jax.tree_util.tree_map(np.asarray, out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*a)
    jax.tree_util.tree_map(np.asarray, out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:32s} compile {c:7.2f}s run {dt:8.2f} ms ({dt/B:6.2f} ms/f)",
          flush=True)
    return out


feats = bench("extract_orb_batch(16)",
              lambda x: O.extract_orb_batch(x, n_features=NF), imgs)
pyr_fn = jax.jit(jax.vmap(lambda im: tuple(I.build_pyramid(im, 8, 1.2))))
pyr = bench("build_pyramid x16", pyr_fn, imgs)
bench("fast_score L0 x16", jax.jit(jax.vmap(pk.fast_score)), imgs)
bench("gaussian_blur7 L0 x16",
      jax.jit(jax.vmap(lambda im: pk.gaussian_blur7(im, 2.0))), imgs)
ms_fn = jax.jit(jax.vmap(
    lambda fl, fr, pl, pr: match_stereo(
        fl, fr, pl, pr, bf=50.0, baseline=0.11, n_levels=8,
        scale_factor=1.2)
))
bench("match_stereo x16", lambda: ms_fn(feats, feats, pyr, pyr))
bench("stereo_frontend_batch(16)",
      lambda: T.stereo_frontend_batch(imgs_u8, imgs_u8, cam, cfg, 50.0))
