"""Place recognition (vocabulary/database) and PnP relocalization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.geometry import so3
from orb_slam3_noted_tpu.ops import matching as M
from orb_slam3_noted_tpu.optim.pnp import pnp_ransac
from orb_slam3_noted_tpu.place import KeyFrameDatabase, train_vocabulary
from orb_slam3_noted_tpu.place.vocab import bow_vector, transform


def random_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_flip):
    """Flip n_flip random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        for b in rng.integers(0, 256, size=n_flip):
            out[i, b // 32] ^= np.uint32(1 << (b % 32))
    return out


class TestVocabulary:
    def test_transform_assigns_nearest(self, rng):
        train = random_desc(rng, 2000)
        vocab = train_vocabulary(train, n_words=64, n_iters=4)
        q = jnp.asarray(random_desc(rng, 32))
        word, dist = transform(jnp.asarray(vocab), q, jnp.ones(32, bool))
        d = np.asarray(M.hamming_matrix(q, jnp.asarray(vocab)))
        np.testing.assert_array_equal(np.asarray(word), d.argmin(axis=1))

    def test_bow_similarity_discriminates(self, rng):
        train = random_desc(rng, 4000)
        vocab = jnp.asarray(train_vocabulary(train, n_words=256, n_iters=4))
        # scene A and a slightly-perturbed revisit of A; scene B unrelated
        a = random_desc(rng, 300)
        a2 = perturb_desc(rng, a, 12)  # ~12 bit flips: same place, new view
        b = random_desc(rng, 300)
        vs = []
        for d in (a, a2, b):
            w, _ = transform(vocab, jnp.asarray(d), jnp.ones(300, bool))
            vs.append(bow_vector(w, 256))
        sim_aa = 1.0 - 0.5 * float(jnp.abs(vs[0] - vs[1]).sum())
        sim_ab = 1.0 - 0.5 * float(jnp.abs(vs[0] - vs[2]).sum())
        assert sim_aa > sim_ab + 0.1, (sim_aa, sim_ab)

    def test_database_retrieval(self, rng):
        train = random_desc(rng, 4000)
        vocab = train_vocabulary(train, n_words=256, n_iters=4)
        db = KeyFrameDatabase(vocab, max_keyframes=16)
        scenes = [random_desc(rng, 200) for _ in range(8)]
        for i, d in enumerate(scenes):
            _, bow = db.compute_bow(jnp.asarray(d), jnp.ones(200, bool))
            db.add(i, bow)
        # query = revisit of scene 5
        q = perturb_desc(rng, scenes[5], 10)
        _, bow_q = db.compute_bow(jnp.asarray(q), jnp.ones(200, bool))
        exclude = np.zeros(16, bool)
        slots, scores = db.detect_candidates(bow_q, exclude, n_best=3)
        assert slots[0] == 5
        # excluding the true match must not return it
        exclude[5] = True
        slots2, _ = db.detect_candidates(bow_q, exclude, n_best=3)
        assert 5 not in slots2


class TestPnP:
    def test_recover_pose(self, rng):
        n = 200
        Xw = jnp.asarray(
            (rng.uniform(-2, 2, size=(n, 3)) + np.array([0, 0, 5.0])).astype(np.float32)
        )
        Rcw = so3.exp(jnp.asarray([0.2, -0.3, 0.1], jnp.float32))
        tcw = jnp.asarray([0.5, -0.3, 0.8], jnp.float32)
        xc = Xw @ Rcw.T + tcw
        rays = xc / xc[:, 2:3]
        # corrupt 30% of matches
        rays_np = np.array(rays)
        bad = rng.choice(n, size=60, replace=False)
        rays_np[bad, :2] += rng.uniform(0.05, 0.3, size=(60, 2))
        res = pnp_ransac(
            Xw, jnp.asarray(rays_np), jnp.ones(n, bool), jax.random.PRNGKey(0)
        )
        assert bool(res.success)
        inl = np.asarray(res.inliers)
        assert inl[bad].sum() == 0
        np.testing.assert_allclose(np.asarray(res.Rcw), np.asarray(Rcw), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.tcw), np.asarray(tcw), atol=5e-3)

    def test_degenerate_fails(self, rng):
        # all matches wrong -> no success
        n = 64
        Xw = jnp.asarray(rng.uniform(-2, 2, size=(n, 3)).astype(np.float32) + np.array([0,0,5],np.float32))
        rays = jnp.asarray(
            np.concatenate(
                [rng.uniform(-0.5, 0.5, size=(n, 2)), np.ones((n, 1))], axis=1
            ).astype(np.float32)
        )
        res = pnp_ransac(Xw, rays, jnp.ones(n, bool), jax.random.PRNGKey(1))
        assert not bool(res.success)
