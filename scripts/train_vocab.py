"""Offline vocabulary training: many synthetic viewpoints -> 32k-word bank.

Replaces the reference's shipped pretrained ``ORBvoc.txt`` (10^6-word k=10
L=6 DBoW2 tree, stripped from this mirror per ``.MISSING_LARGE_BLOBS``): we
train hierarchically (k=32, 3 levels, the same HKmeansStep construction as
``TemplatedVocabulary::create``) for speed, then FLATTEN the 32768 leaves
into one centroid bank — the MXU ``transform`` does exact flat argmin, which
is strictly better retrieval than a greedy tree descent.

Run:  python scripts/train_vocab.py  (CPU, ~10 min)
Out:  orb_slam3_noted_tpu/assets/vocab32k.npz  {"vocab": (W, 8) uint32}
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam3_noted_tpu.models.cameras import Camera, PINHOLE  # noqa: E402
from orb_slam3_noted_tpu.ops import matching as M               # noqa: E402
from orb_slam3_noted_tpu.ops import orb as O                    # noqa: E402
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom         # noqa: E402
from orb_slam3_noted_tpu.geometry import so3                    # noqa: E402

BRANCH = 32
LEVELS = 3          # 32^3 = 32768 leaf words
N_SCENES = 6
N_VIEWS = 10
W, H = 640, 480


def harvest_descriptors():
    cam = Camera(PINHOLE, (400.0, 400.0, 320.0, 240.0))
    out = []
    rng = np.random.default_rng(7)
    for s in range(N_SCENES):
        room = BoxRoom(seed=100 + s, depth=rng.uniform(5, 10),
                       h=rng.uniform(1.0, 2.0), w=rng.uniform(2.0, 4.0),
                       tex_scale=rng.uniform(50, 120))
        for v in range(N_VIEWS):
            twc = np.array([
                rng.uniform(-1, 1), rng.uniform(-0.3, 0.3), rng.uniform(0, 3)
            ])
            rvec = jnp.asarray(rng.uniform(-0.25, 0.25, 3), jnp.float32)
            Rwc = np.asarray(so3.exp(rvec))
            img = room.render(Rwc, twc, cam.params, W, H)
            feats = O.extract_orb(jnp.asarray(img, jnp.float32),
                                  n_features=1000)
            d = np.asarray(feats.desc)[np.asarray(feats.valid)]
            out.append(d)
            print(f"scene {s} view {v}: {len(d)} descriptors", flush=True)
    return np.concatenate(out)


def kmajority(bits, k, n_iters, rng):
    """Binary k-means (per-bit majority centroids) on unpacked bits."""
    n = len(bits)
    if n <= k:
        return bits.copy()
    cent = bits[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iters):
        d = np.asarray(
            M.hamming_matrix_mxu(jnp.asarray(bits), jnp.asarray(cent))
        )
        assign = d.argmin(axis=1)
        new = np.zeros_like(cent)
        counts = np.bincount(assign, minlength=k)
        for c in range(k):
            sel = bits[assign == c]
            new[c] = (sel.mean(axis=0) >= 0.5) if len(sel) else cent[c]
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            far = d.min(axis=1).argsort()[::-1][: len(empty)]
            new[empty] = bits[far]
        if np.array_equal(new, cent):
            break
        cent = new
    return cent


def train_tree(bits, rng, level=0):
    """Recursive HKmeansStep; returns the list of leaf centroids."""
    if level == LEVELS - 1 or len(bits) <= BRANCH:
        return [kmajority(bits, min(BRANCH, max(len(bits), 1)), 6, rng)]
    cent = kmajority(bits, BRANCH, 6, rng)
    d = np.asarray(M.hamming_matrix_mxu(jnp.asarray(bits), jnp.asarray(cent)))
    assign = d.argmin(axis=1)
    leaves = []
    for c in range(len(cent)):
        sub = bits[assign == c]
        if len(sub) == 0:
            continue
        leaves.extend(train_tree(sub, rng, level + 1))
    return leaves


def main():
    desc = harvest_descriptors()
    print(f"total descriptors: {len(desc)}", flush=True)
    bits = np.asarray(M.unpack_bits(jnp.asarray(desc)))
    rng = np.random.default_rng(0)
    leaves = np.concatenate(train_tree(bits, rng))
    # dedupe identical words
    leaves = np.unique(leaves, axis=0)
    print(f"vocabulary words: {len(leaves)}", flush=True)
    shifts = np.arange(32, dtype=np.uint32)
    packed = (
        leaves.reshape(len(leaves), 8, 32).astype(np.uint32)
        << shifts[None, None, :]
    ).sum(axis=2, dtype=np.uint32)
    out = os.path.join(
        os.path.dirname(__file__), "..", "orb_slam3_noted_tpu", "assets",
        "vocab32k.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, vocab=packed)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
