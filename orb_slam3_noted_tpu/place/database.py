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
        covis: np.ndarray | None = None,
    ):
        """Best-scoring non-excluded keyframes (loop/merge candidates).

        Without ``covis`` this is the simple best-score policy.  With a
        (KF, KF) covisibility-weight matrix it implements the full
        ``DetectNBestCandidates`` pipeline
        (`/root/reference/src/KeyFrameDatabase.cc:611-700`):

        1. common-word count vs the query per stored KF; candidates must
           reach 0.8x the maximum ("minCommonWords");
        2. L1 BoW score for surviving candidates;
        3. scores accumulated over each candidate's top-10 covisibility
           group ("accScore"), because a true loop re-observes a *place*,
           i.e. several covisible keyframes score together;
        4. the best single keyframe of each of the top groups is returned.

        Returns (slots, scores) lists (possibly shorter than n_best).
        """
        scores = np.array(_score_all(self.bow_mat, bow_q))  # writable copy
        alive = self.present & ~np.asarray(exclude_mask, bool)
        scores[~alive] = -1.0
        if covis is None:
            order = np.argsort(-scores)[:n_best]
            best = scores[order[0]] if len(order) else -1.0
            out_slots, out_scores = [], []
            for s in order:
                if scores[s] > 0 and scores[s] >= min_rel_score * best:
                    out_slots.append(int(s))
                    out_scores.append(float(scores[s]))
            return out_slots, out_scores

        # --- full policy ---
        qpres = np.asarray(bow_q) > 0
        pres = np.asarray(self.bow_mat) > 0
        common = (pres & qpres[None, :]).sum(axis=1)
        common = np.where(alive, common, 0)
        max_common = common.max() if common.size else 0
        if max_common < 1:
            return [], []
        cand = alive & (common >= 0.8 * max_common) & (scores > 0)
        if not cand.any():
            return [], []
        cand_scores = np.where(cand, scores, 0.0)

        # top-10 covisibility group per candidate (incl. itself)
        KF = len(scores)
        cv = np.asarray(covis, np.float32).copy()
        np.fill_diagonal(cv, 0.0)
        top10 = np.argsort(-cv, axis=1)[:, :10]
        group = np.zeros((KF, KF), bool)
        rows = np.repeat(np.arange(KF), 10)
        group[rows, top10.reshape(-1)] = cv[rows, top10.reshape(-1)] > 0
        np.fill_diagonal(group, True)

        acc = group @ cand_scores                      # (KF,) group score
        acc = np.where(cand, acc, -1.0)
        best_acc = acc.max()
        out_slots, out_scores = [], []
        for g in np.argsort(-acc):
            if acc[g] < min_rel_score * best_acc or acc[g] <= 0:
                break
            members = np.where(group[g], cand_scores, -1.0)
            s = int(np.argmax(members))
            if members[s] > 0 and s not in out_slots:
                out_slots.append(s)
                out_scores.append(float(members[s]))
            if len(out_slots) >= n_best:
                break
        return out_slots, out_scores
