"""Per-stage TPU timing of the tracking hot path (round-2 profiling).

Times each jitted stage separately after warm-up, on the real device.
Run: python profile_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.ops import fast as F
from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops import pallas_kernels as pk
from orb_slam3_noted_tpu.pipeline import map_state as MS
from orb_slam3_noted_tpu.pipeline import tracking as T
from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory


def timeit(name, fn, n=20):
    fn()  # warm
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:35s} {dt:8.2f} ms")
    return dt


def main():
    W, H, nfeat = 752, 480, 1200
    cam = Camera(PINHOLE, (458.654, 457.296, 367.215, 248.375))
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=nfeat,
        max_keyframes=64, max_map_points=8192,
        local_window=5, kf_max_interval=10,
    )
    room = BoxRoom(seed=0)
    poses = orbit_trajectory(12, forward=0.025)
    frames = [room.render(R, t, cam.params, W, H) for R, t in poses]

    # build a small live map by running the system for a few frames
    slam = MonoSLAM(cfg)
    for i in range(len(frames)):
        slam.process(frames[i], i)
    m = slam.m
    print(f"map: n_kf={slam.n_kf} n_mp={slam.n_mp} state={slam.state}")

    img_u8 = jnp.asarray(frames[-1].astype(np.uint8))
    img_f = img_u8.astype(jnp.float32)
    Rp, tp = slam.last_Rcw, slam.last_tcw

    # --- stage timings ---
    timeit("extract_orb (full)", lambda: O.extract_orb(
        img_f, n_features=nfeat, n_levels=cfg.n_levels,
        scale_factor=cfg.scale_factor, th_high=cfg.ini_th_fast,
        th_low=cfg.min_th_fast))

    levels = I.build_pyramid(img_f, cfg.n_levels, cfg.scale_factor)
    pyr = jax.jit(lambda x: tuple(I.build_pyramid(x, cfg.n_levels, cfg.scale_factor)))
    timeit("  build_pyramid", lambda: pyr(img_f))

    fs = jax.jit(pk.fast_score)
    timeit("  fast_score L0", lambda: fs(levels[0]))
    budgets = F.level_budgets(nfeat, cfg.n_levels, cfg.scale_factor)
    sc0 = fs(levels[0])
    timeit("  detect_level L0", lambda: F.detect_level(
        sc0, n_out=budgets[0], th_high=20.0, th_low=7.0, border=16))
    gb = jax.jit(lambda x: pk.gaussian_blur7(x, 2.0))
    timeit("  gaussian_blur7 L0", lambda: gb(levels[0]))
    ic = jax.jit(O.ic_angle_maps)
    timeit("  ic_angle_maps L0", lambda: ic(levels[0]))
    kps = F.detect_level(sc0, n_out=budgets[0], th_high=20.0, th_low=7.0, border=16)
    blur0 = gb(levels[0])
    ang = O.ic_angles(levels[0], kps.xy)
    bd = jax.jit(O.brief_descriptors)
    timeit("  brief_descriptors L0", lambda: bd(blur0, kps.xy, ang))

    # tracking stages
    mp_mask, _ = MS.local_map_mask(m, jnp.int32(slam.last_kf_slot), n_neighbors=cfg.local_window)
    feats = O.extract_orb(img_f, n_features=nfeat, n_levels=cfg.n_levels,
                          scale_factor=cfg.scale_factor, th_high=cfg.ini_th_fast,
                          th_low=cfg.min_th_fast)
    lmm = jax.jit(lambda m, s: MS.local_map_mask(m, s, n_neighbors=cfg.local_window))
    timeit("local_map_mask", lambda: lmm(m, jnp.int32(slam.last_kf_slot)))
    timeit("track_frame", lambda: T.track_frame(
        m, feats, Rp, tp, mp_mask, cam, cfg, feat_uvr=None, bf=0.0))
    timeit("track_step (fused)", lambda: T.track_step(
        m, img_u8, jnp.int32(slam.last_kf_slot), Rp, tp, cam, cfg, bf=0.0))

    B = 8
    batch = jnp.stack([img_u8] * B)
    vel = (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    dt = timeit("track_batch B=8", lambda: T.track_batch(
        m, batch, jnp.int32(slam.last_kf_slot), Rp, tp, vel, cam, cfg, bf=0.0), n=5)
    print(f"  -> per-frame {dt/B:.2f} ms = {1000/(dt/B):.1f} fps (tracking only)")

    # mapping stages
    timeit("triangulate_between", lambda: T.triangulate_between(
        m, jnp.int32(slam.last_kf_slot), jnp.int32(0), cam, cfg), n=5)
    timeit("fuse_map_points", lambda: T.fuse_map_points(
        m, jnp.int32(slam.last_kf_slot), mp_mask, cam, cfg), n=5)
    timeit("local_ba", lambda: T.local_ba(
        m, jnp.int32(slam.last_kf_slot), cam, cfg, window=cfg.local_window), n=5)
    cm = jax.jit(MS.cull_map_points)
    timeit("cull_map_points", lambda: cm(m, jnp.int32(slam.last_kf_slot)), n=5)


if __name__ == "__main__":
    main()
