"""Map maintenance tests: duplicate fusion, point/keyframe culling."""

import numpy as np
import pytest
import jax.numpy as jnp

from orb_slam3_noted_tpu.io.config import SlamConfig
from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE, project
from orb_slam3_noted_tpu.pipeline import map_state as MS
from orb_slam3_noted_tpu.pipeline import tracking as T

CAM = Camera(PINHOLE, (260.0, 260.0, 159.5, 119.5))
CFG = SlamConfig(
    camera=CAM, width=320, height=240, n_features=64,
    max_keyframes=8, max_map_points=256,
)


def make_map_with_duplicates(rng, n_pts=30):
    """KF0 bound to points A; KF0 features at the same pixels could also match
    duplicate points B at (almost) the same 3D positions, observed by KF1."""
    m = MS.empty_map(CFG)
    pts = (rng.uniform(-1, 1, size=(n_pts, 3)) + np.array([0, 0, 4.0])).astype(
        np.float32
    )
    desc = rng.integers(0, 2**32, size=(n_pts, 8), dtype=np.uint32)
    uv = np.asarray(project(CAM, jnp.asarray(pts)))
    NF = CFG.n_features

    def pad(x, fill=0):
        out = np.full((NF,) + x.shape[1:], fill, x.dtype)
        out[: len(x)] = x
        return out

    feat_valid = np.zeros(NF, bool); feat_valid[:n_pts] = True
    # KF0 with features bound to points A (slots 0..n-1)
    m = MS.add_keyframe(
        m, jnp.int32(0), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.int32(0), jnp.asarray(pad(uv.astype(np.float32))),
        jnp.zeros(NF, jnp.int32), jnp.zeros(NF, jnp.float32),
        jnp.asarray(pad(desc)), jnp.asarray(feat_valid),
        jnp.asarray(pad(np.arange(n_pts, dtype=np.int32), -1)),
        jnp.full(NF, -1.0, jnp.float32),
    )
    acc = np.zeros(NF, bool); acc[:n_pts] = True
    # scale range centered on the true distance so PredictScale -> level 0
    dist = np.linalg.norm(pts, axis=1)
    dmin = pad((dist * 0.5).astype(np.float32))
    dmax = pad((dist * 1.05).astype(np.float32))
    m = MS.add_map_points(
        m, jnp.int32(0), jnp.asarray(pad(pts)), jnp.asarray(pad(desc)),
        jnp.zeros((NF, 3), jnp.float32), jnp.asarray(dmin),
        jnp.asarray(dmax), jnp.int32(0), jnp.asarray(acc),
        jnp.int32(0), jnp.arange(NF, dtype=jnp.int32),
        jnp.int32(0), jnp.arange(NF, dtype=jnp.int32),
    )
    # duplicates B (slots n..2n-1): same positions + tiny offset, same desc,
    # "observed" by KF1 (bound there)
    m = MS.add_keyframe(
        m, jnp.int32(1), jnp.eye(3, dtype=jnp.float32),
        jnp.asarray([0.05, 0.0, 0.0], jnp.float32),
        jnp.int32(1), jnp.asarray(pad(uv.astype(np.float32))),
        jnp.zeros(NF, jnp.int32), jnp.zeros(NF, jnp.float32),
        jnp.asarray(pad(desc)), jnp.asarray(feat_valid),
        jnp.asarray(pad(np.arange(n_pts, 2 * n_pts, dtype=np.int32), -1)),
        jnp.full(NF, -1.0, jnp.float32),
    )
    m = MS.add_map_points(
        m, jnp.int32(n_pts), jnp.asarray(pad(pts + 0.003)), jnp.asarray(pad(desc)),
        jnp.zeros((NF, 3), jnp.float32), jnp.asarray(dmin),
        jnp.asarray(dmax), jnp.int32(1), jnp.asarray(acc),
        jnp.int32(1), jnp.arange(NF, dtype=jnp.int32),
        jnp.int32(1), jnp.arange(NF, dtype=jnp.int32),
    )
    return m, n_pts


class TestFuse:
    def test_duplicates_merged(self, rng):
        m, n = make_map_with_duplicates(rng)
        # KF0's features are bound to A; source = the duplicates B
        src = np.zeros(CFG.max_map_points, bool); src[n : 2 * n] = True
        # make normals point toward the camera so visibility passes
        m = m._replace(mp_normal=jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (CFG.max_map_points, 1)) * -1.0)
        m2 = T.fuse_map_points(m, jnp.int32(0), jnp.asarray(src), CAM, CFG)
        valid_after = np.asarray(m2.mp_valid)
        # most duplicates were merged away (losers invalidated)
        n_dup_alive = valid_after[n : 2 * n].sum() + valid_after[:n].sum()
        assert n_dup_alive <= 2 * n - 0.6 * n, n_dup_alive
        # no binding refers to an invalid point
        kf_mp = np.asarray(m2.kf_mp)
        bound = kf_mp[kf_mp >= 0]
        assert valid_after[bound].all()


class TestCulling:
    def test_cull_low_ratio_points(self, rng):
        m, n = make_map_with_duplicates(rng)
        # point 0: seen 20 times but found twice -> cull; point 1: good ratio
        m = m._replace(
            mp_visible=m.mp_visible.at[0].set(20).at[1].set(20),
            mp_found=m.mp_found.at[0].set(2).at[1].set(18),
            # give good nobs so only the ratio check can trigger
            mp_nobs=jnp.full_like(m.mp_nobs, 4),
        )
        m2 = MS.cull_map_points(m, jnp.int32(2))
        assert not bool(m2.mp_valid[0])
        assert bool(m2.mp_valid[1])
        # bindings to the culled point were removed
        assert not (np.asarray(m2.kf_mp) == 0).any()

    def test_cull_weak_recent_points(self, rng):
        m, n = make_map_with_duplicates(rng)
        # all points have nobs=2 and ref_kf 0/1; current kf 3 -> recent & weak
        m2 = MS.cull_map_points(m, jnp.int32(3))
        assert int(m2.mp_valid.sum()) == 0
        # brand-new points are not culled
        m3 = MS.cull_map_points(m, jnp.int32(1))
        assert int(m3.mp_valid.sum()) == 2 * n
        # settled old points (age > 3) are left alone
        m4 = MS.cull_map_points(m, jnp.int32(6))
        assert int(m4.mp_valid.sum()) == 2 * n

    def test_cull_redundant_keyframe(self, rng):
        m, n = make_map_with_duplicates(rng)
        # make all of KF1's points heavily observed -> KF1 redundant
        m = m._replace(mp_nobs=jnp.full_like(m.mp_nobs, 5))
        window = jnp.zeros(CFG.max_keyframes, bool).at[1].set(True)
        protect = jnp.zeros(CFG.max_keyframes, bool).at[0].set(True)
        m2 = MS.cull_keyframes(m, window, protect)
        assert not bool(m2.kf_valid[1])
        assert bool(m2.kf_valid[0])
        # a protected keyframe is never culled
        window_p = jnp.zeros(CFG.max_keyframes, bool).at[0].set(True)
        m3 = MS.cull_keyframes(m, window_p, protect)
        assert bool(m3.kf_valid[0])


class TestCompaction:
    def test_compact_returns_remap(self, rng):
        """`compact_map_points` must hand back an old->new index map so
        in-flight feature bindings survive the permutation (round-4 fix:
        stale `mp_of_feat` after mid-walk compaction bound features to the
        wrong landmarks)."""
        m, n = make_map_with_duplicates(rng)
        # punch holes: invalidate every third point below the pointer
        valid = np.asarray(m.mp_valid)
        holes = np.zeros_like(valid)
        holes[: 2 * n : 3] = True
        m = m._replace(mp_valid=jnp.asarray(valid & ~holes))
        pos_before = np.asarray(m.mp_pos)
        m2, n_valid, inv = MS.compact_map_points(m)
        inv = np.asarray(inv)
        assert int(n_valid) == int((valid & ~holes).sum())
        # every surviving old index maps to a slot holding the same point
        pos_after = np.asarray(m2.mp_pos)
        for old in np.nonzero(valid & ~holes)[0]:
            assert inv[old] >= 0
            np.testing.assert_array_equal(pos_after[inv[old]], pos_before[old])
        # culled slots map to -1
        assert (inv[np.nonzero(holes & valid)[0]] == -1).all()
        # remap helper: stale bindings translate, unbound stays unbound
        stale = jnp.asarray(
            np.r_[np.arange(2 * n, dtype=np.int32), np.int32(-1)]
        )
        remapped = np.asarray(MS.remap_point_bindings(stale, jnp.asarray(inv)))
        assert remapped[-1] == -1
        np.testing.assert_array_equal(remapped[: 2 * n], inv[: 2 * n])
        # composition: two compactions compose to one old->newest map
        m3, _, inv2 = MS.compact_map_points(m2)
        comp = np.asarray(
            MS.compose_point_remaps(jnp.asarray(inv), jnp.asarray(inv2))
        )
        for old in np.nonzero(valid & ~holes)[0]:
            assert comp[old] == np.asarray(inv2)[inv[old]]


@pytest.mark.slow
def test_kf_slot_recycling_past_capacity():
    """A run that allocates past max_keyframes must keep inserting by
    recycling culled slots (reference SetBadFlag/EraseKeyFrame lifecycle;
    round-3 free-list).  Map-point compaction keeps the allocator alive."""
    import numpy as np
    from orb_slam3_noted_tpu.io.config import SlamConfig
    from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE
    from orb_slam3_noted_tpu.pipeline.system import MonoSLAM
    from orb_slam3_noted_tpu.utils.synthetic import BoxRoom, orbit_trajectory

    W, H = 320, 240
    cam = Camera(PINHOLE, (260.0, 260.0, W / 2 - 0.5, H / 2 - 0.5))
    cfg = SlamConfig(
        camera=cam, width=W, height=H, n_features=500,
        max_keyframes=10, max_map_points=3072,
        local_window=3, kf_max_interval=2, kf_min_interval=1,
        kf_tracked_ratio=1.5,  # aggressive insertion -> high redundancy
        enable_loop_closing=True,
    )
    room = BoxRoom(seed=0)
    # phase 1: enough parallax for monocular init; phase 2: near-static —
    # every new keyframe is redundant with the window, so the
    # 90%-redundancy cull fires and frees slots for recycling
    lead = orbit_trajectory(12, forward=0.02)
    R_end, t_end = lead[-1]
    poses = list(lead) + [(R_end, t_end)] * 40
    n = len(poses)
    frames = [room.render(R, t, cam.params, W, H) for R, t in poses]
    slam = MonoSLAM(cfg)
    for i, f in enumerate(frames):
        slam.process(f, i)
    slam.flush()
    # recycling evidence: more insertions than fresh slot allocations
    # (every insert beyond n_kf fresh allocations reused a culled slot)
    assert slam.kf_inserted + 2 > slam.n_kf, (
        f"no recycling (inserted={slam.kf_inserted}, fresh={slam.n_kf})"
    )
    assert slam.n_kf <= cfg.max_keyframes
    # the system must still be tracking at the end (no permanent stall)
    assert slam.trajectory[-1].state == "OK"
    assert slam.n_mp <= cfg.max_map_points
