"""Keyframe database: loop/merge/relocalization candidate retrieval.

Equivalent of ``KeyFrameDatabase`` (`/root/reference/src/KeyFrameDatabase.cc`
``DetectNBestCandidates`` `:611`, ``DetectRelocalizationCandidates``): the
word->keyframe inverted file becomes a dense (KF_CAP, W) matrix of BoW
vectors on device; scoring a query against every stored keyframe is one
matmul, and the reference's candidate policy (exclude covisibles, accumulate
scores over top covisibility groups, best-N) becomes masked top-k.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.place import vocab as V


@partial(jax.jit, static_argnames=())
def _score_all(bow_mat: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L1 similarity of q against every row (1 - 0.5 |a - b|_1)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(bow_mat - q[None, :]), axis=-1)


class KeyFrameDatabase:
    """Host-side wrapper holding the device-resident (KF, W) BoW matrix."""

    def __init__(self, vocab: np.ndarray, max_keyframes: int):
        self.vocab = jnp.asarray(vocab)
        self.n_words = vocab.shape[0]
        self.bow_mat = jnp.zeros((max_keyframes, self.n_words), jnp.float32)
        self.present = np.zeros(max_keyframes, bool)

    # ------------------------------------------------------------------
    def compute_bow(self, desc: jnp.ndarray, valid: jnp.ndarray):
        """(words (N,), bow (W,)) for one frame's descriptors."""
        word, _ = V.transform(self.vocab, desc, valid)
        return word, V.bow_vector(word, self.n_words)

    def add(self, slot: int, bow: jnp.ndarray):
        """Register/overwrite keyframe `slot` (reference ``add``/``erase``)."""
        self.bow_mat = self.bow_mat.at[slot].set(bow)
        self.present[slot] = True

    def erase(self, slot: int):
        self.bow_mat = self.bow_mat.at[slot].set(0.0)
        self.present[slot] = False

    # ------------------------------------------------------------------
    def detect_candidates(
        self,
        bow_q: jnp.ndarray,
        exclude_mask: np.ndarray,
        n_best: int = 3,
        min_rel_score: float = 0.75,
    ):
        """Best-scoring non-excluded keyframes (loop/merge candidates).

        Mirrors ``DetectNBestCandidates``: covisible keyframes of the query
        are excluded (exclude_mask), candidates must reach a fraction of the
        best score.  Returns (slots (n_best,), scores (n_best,)) as numpy;
        slots with score <= 0 are invalid.
        """
        scores = np.array(_score_all(self.bow_mat, bow_q))  # writable copy
        scores[~self.present] = -1.0
        scores[np.asarray(exclude_mask, bool)] = -1.0
        order = np.argsort(-scores)[:n_best]
        best = scores[order[0]] if len(order) else -1.0
        out_slots, out_scores = [], []
        for s in order:
            if scores[s] > 0 and scores[s] >= min_rel_score * best:
                out_slots.append(int(s))
                out_scores.append(float(scores[s]))
        return out_slots, out_scores
