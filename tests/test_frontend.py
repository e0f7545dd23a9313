"""Feature-frontend tests: FAST, orientation, rBRIEF, matching (SURVEY §7 B)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.ops import fast as F
from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops import matching as M
from orb_slam3_noted_tpu.ops import orb as O


def synthetic_corners(h=120, w=160, squares=((30, 40), (80, 100), (30, 120), (90, 30))):
    """Black image with bright axis-aligned squares -> corners at known spots."""
    img = np.zeros((h, w), np.float32)
    corners = []
    for (cy, cx) in squares:
        img[cy : cy + 14, cx : cx + 14] = 200.0
        corners += [
            (cy, cx), (cy, cx + 13), (cy + 13, cx), (cy + 13, cx + 13),
        ]
    return jnp.asarray(img), corners


class TestFAST:
    def test_flat_image_no_corners(self):
        s = F.fast_score(jnp.full((64, 64), 100.0, jnp.float32))
        assert float(jnp.max(s)) <= 0.0

    def test_square_corners_detected(self):
        img, corners = synthetic_corners()
        score = F.fast_score(img)
        kps = F.detect_level(score, n_out=64, th_high=20.0, th_low=7.0, border=8)
        det = np.asarray(kps.xy)[np.asarray(kps.valid)]
        assert len(det) >= 8
        found = 0
        for (cy, cx) in corners:
            d = np.abs(det - np.array([cx, cy])).max(axis=1)
            if len(d) and d.min() <= 2:
                found += 1
        assert found >= len(corners) * 0.75

    def test_budget_and_validity(self):
        img, _ = synthetic_corners()
        score = F.fast_score(img)
        kps = F.detect_level(score, n_out=500, border=8)
        assert kps.xy.shape == (500, 2)
        v = np.asarray(kps.valid)
        # scores of valid entries sorted descending-ish and all > low threshold
        assert np.all(np.asarray(kps.score)[v] > 7.0)
        # invalid tail present (image has far fewer than 500 corners)
        assert v.sum() < 500

    def test_level_budgets(self):
        b = F.level_budgets(1200, 8, 1.2)
        assert sum(b) == 1200
        assert all(x >= 0 for x in b)
        assert b[0] > b[1] > b[2]


class TestOrientation:
    def test_gradient_angle(self):
        # intensity ramp along +x -> m10 > 0, m01 ~ 0 -> angle ~ 0
        w = h = 64
        ramp_x = jnp.asarray(np.tile(np.arange(w, dtype=np.float32), (h, 1)))
        ang = O.ic_angles(ramp_x, jnp.asarray([[32.0, 32.0]]))
        assert abs(float(ang[0])) < 0.05
        # ramp along +y -> angle ~ +pi/2
        ramp_y = jnp.asarray(np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w)))
        ang = O.ic_angles(ramp_y, jnp.asarray([[32.0, 32.0]]))
        assert abs(float(ang[0]) - np.pi / 2) < 0.05

    def test_rotation_steers_angle(self, rng):
        # random blob pattern, rotated by 90 deg -> angle shifts by ~90 deg
        patch = rng.uniform(0, 255, size=(41, 41)).astype(np.float32)
        img = np.zeros((101, 101), np.float32)
        img[30:71, 30:71] = patch
        img90 = np.rot90(img, k=-1).copy()  # rotate by -90 (x->y)
        a0 = float(O.ic_angles(jnp.asarray(img), jnp.asarray([[50.0, 50.0]]))[0])
        a1 = float(O.ic_angles(jnp.asarray(img90), jnp.asarray([[50.0, 50.0]]))[0])
        d = (a1 - a0 - np.pi / 2 + np.pi) % (2 * np.pi) - np.pi
        assert abs(d) < 0.1


class TestBrief:
    def test_pack_unpack_roundtrip(self, rng):
        desc = jnp.asarray(rng.integers(0, 2**32, size=(16, 8), dtype=np.uint32))
        bits = M.unpack_bits(desc)
        repacked = jnp.sum(
            bits.reshape(16, 8, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)[None, None, :],
            axis=-1,
            dtype=jnp.uint32,
        )
        np.testing.assert_array_equal(repacked, desc)

    def test_descriptor_rotation_invariance(self, rng):
        # Same texture, rotated 45 deg: steered BRIEF should give a LOW hamming
        # distance to itself vs distance to an unrelated patch.
        n = 201
        base = rng.uniform(0, 255, size=(n, n)).astype(np.float32)
        base = np.asarray(I.gaussian_blur(jnp.asarray(base), 7, 3.0))  # smooth texture
        # rotate image by 45 deg around center with bilinear sampling (numpy)
        c = (n - 1) / 2.0
        yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
        th = np.pi / 4
        xs = np.cos(th) * (xx - c) - np.sin(th) * (yy - c) + c
        ys = np.sin(th) * (xx - c) + np.cos(th) * (yy - c) + c
        x0 = np.clip(np.floor(xs).astype(int), 0, n - 2)
        y0 = np.clip(np.floor(ys).astype(int), 0, n - 2)
        fx = xs - x0
        fy = ys - y0
        rot = (
            base[y0, x0] * (1 - fx) * (1 - fy)
            + base[y0, x0 + 1] * fx * (1 - fy)
            + base[y0 + 1, x0] * (1 - fx) * fy
            + base[y0 + 1, x0 + 1] * fx * fy
        ).astype(np.float32)

        img_a = jnp.asarray(base)
        img_b = jnp.asarray(rot)
        blur_a = I.gaussian_blur(img_a, 7, 2.0)
        blur_b = I.gaussian_blur(img_b, 7, 2.0)
        kp = jnp.asarray([[c, c]], jnp.float32)
        ang_a = O.ic_angles(img_a, kp)
        ang_b = O.ic_angles(img_b, kp)
        da = O.brief_descriptors(blur_a, kp, ang_a)
        db = O.brief_descriptors(blur_b, kp, ang_b)
        d_self = int(M.hamming_matrix(da, db)[0, 0])
        # unrelated patch baseline
        other = jnp.asarray(rng.uniform(0, 255, size=(n, n)).astype(np.float32))
        do = O.brief_descriptors(I.gaussian_blur(other, 7, 2.0), kp, ang_a)
        d_other = int(M.hamming_matrix(da, do)[0, 0])
        assert d_self < 60, d_self          # steered -> survives rotation
        assert d_other > 90, d_other        # random baseline ~128


class TestMatching:
    def test_identity_match(self, rng):
        desc = jnp.asarray(rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32))
        d = M.hamming_matrix(desc, desc)
        m = M.match_nn(d, jnp.ones(64, bool), jnp.ones(64, bool), max_dist=10)
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(64))

    def test_mxu_matches_popcount(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, size=(32, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, size=(48, 8), dtype=np.uint32))
        d1 = M.hamming_matrix(a, b)
        d2 = M.hamming_matrix_mxu(M.unpack_bits(a), M.unpack_bits(b))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_invalid_masked(self, rng):
        desc = jnp.asarray(rng.integers(0, 2**32, size=(8, 8), dtype=np.uint32))
        va = jnp.ones(8, bool).at[3].set(False)
        d = M.hamming_matrix(desc, desc)
        m = M.match_nn(d, va, va, max_dist=5)
        assert int(m.idx[3]) == -1

    def test_projection_window_gating(self, rng):
        nq, nf = 16, 64
        feat_xy = jnp.asarray(rng.uniform(0, 600, size=(nf, 2)).astype(np.float32))
        desc = jnp.asarray(rng.integers(0, 2**32, size=(nf, 8), dtype=np.uint32))
        # queries = features 0..15 with slightly perturbed positions
        uv = feat_xy[:nq] + 2.0
        m = M.search_by_projection(
            uv, jnp.full(nq, 6.0), jnp.zeros(nq, jnp.int32),
            desc[:nq], jnp.ones(nq, bool),
            feat_xy, jnp.zeros(nf, jnp.int32), desc, jnp.ones(nf, bool),
            max_dist=0,
        )
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(nq))
        # far-away query radius -> no match
        m2 = M.search_by_projection(
            uv + 500.0, jnp.full(nq, 6.0), jnp.zeros(nq, jnp.int32),
            desc[:nq], jnp.ones(nq, bool),
            feat_xy, jnp.zeros(nf, jnp.int32), desc, jnp.ones(nf, bool),
            max_dist=0,
        )
        assert np.all(np.asarray(m2.idx) == -1)

    def test_resolve_duplicates(self):
        idx = jnp.asarray([2, 2, 5, -1])
        dist = jnp.asarray([10, 4, 7, M.BIG])
        m = M.resolve_duplicates(M.Matches(idx, dist), n_targets=8)
        np.testing.assert_array_equal(np.asarray(m.idx), [-1, 2, 5, -1])


class TestExtract:
    def test_end_to_end_shapes(self, rng):
        img, _ = synthetic_corners(h=240, w=320)
        # add texture so every level finds something
        img = img + jnp.asarray(rng.uniform(0, 30, size=(240, 320)).astype(np.float32))
        feats = O.extract_orb(img, n_features=300, n_levels=4)
        n = feats.xy.shape[0]
        assert n == 300
        v = np.asarray(feats.valid)
        assert v.sum() > 50
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 320
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 240
        assert set(np.unique(np.asarray(feats.level)[v])) <= {0, 1, 2, 3}
