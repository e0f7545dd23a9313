"""Keyframe database: loop/merge/relocalization candidate retrieval.

Equivalent of ``KeyFrameDatabase`` (`/root/reference/src/KeyFrameDatabase.cc`
``DetectNBestCandidates`` `:611`, ``DetectRelocalizationCandidates``): the
word->keyframe inverted file becomes a dense (KF_CAP, W) matrix of BoW
vectors on device; scoring a query against every stored keyframe is one
matmul, and the reference's candidate policy (exclude covisibles, accumulate
scores over top covisibility groups, best-N) becomes masked top-k.

Everything runs as ONE jitted device dispatch per query — round 2 pulled the
(KF, W) matrix to host per keyframe (~8 MB over the device tunnel), which
dominated wall time; now the host receives only the ``n_best`` winning
slots/scores.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_noted_tpu.place import vocab as V

NEG = jnp.float32(-1e30)


@partial(jax.jit, static_argnames=("n_best",))
def _detect_nbest(
    bow_mat: jnp.ndarray,    # (KF, W)
    present: jnp.ndarray,    # (KF,) bool
    bow_q: jnp.ndarray,      # (W,)
    exclude: jnp.ndarray,    # (KF,) bool
    covis: jnp.ndarray,      # (KF, KF) shared-point weights
    min_rel_score: float,
    n_best: int,
):
    """Full ``DetectNBestCandidates`` policy on device.

    1. common-word count vs the query; candidates need 0.8x the max;
    2. L1 BoW score for survivors;
    3. scores accumulated over each candidate's top-10 covisibility group;
    4. the best member of each of the ``n_best`` top groups (deduplicated).

    Returns (slots (n_best,) int32 [-1 = none], scores (n_best,) f32).
    """
    KF = bow_mat.shape[0]
    alive = present & ~exclude
    scores = 1.0 - 0.5 * jnp.sum(jnp.abs(bow_mat - bow_q[None, :]), axis=-1)
    scores = jnp.where(alive, scores, -1.0)

    # common-word counts: one bf16 matmul with exact f32 accumulation
    pres = (bow_mat > 0).astype(jnp.bfloat16)
    qpres = (bow_q > 0).astype(jnp.bfloat16)
    common = jax.lax.dot_general(
        pres, qpres, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    common = jnp.where(alive, common, 0.0)
    max_common = jnp.max(common)
    cand = alive & (common >= 0.8 * max_common) & (scores > 0) & (max_common >= 1)
    cand_scores = jnp.where(cand, scores, 0.0)

    # top-10 covisibility group per row (incl. itself)
    cv = covis * (1.0 - jnp.eye(KF, dtype=covis.dtype))
    top_v, top_i = jax.lax.top_k(cv, min(10, KF))
    rows = jnp.repeat(jnp.arange(KF, dtype=jnp.int32), top_i.shape[1])
    group = (
        jnp.zeros((KF, KF), bool)
        .at[rows, top_i.reshape(-1)].max((top_v > 0).reshape(-1))
    )
    group = group | jnp.eye(KF, dtype=bool)

    acc = jnp.einsum(
        "gk,k->g", group.astype(jnp.float32), cand_scores,
        precision=jax.lax.Precision.HIGHEST,
    )
    acc = jnp.where(cand, acc, NEG)
    best_acc = jnp.max(acc)

    out_slots, out_scores = [], []
    acc_m = acc
    taken = jnp.zeros(KF, bool)
    for _ in range(n_best):
        g = jnp.argmax(acc_m).astype(jnp.int32)
        members = jnp.where(group[g] & ~taken, cand_scores, -1.0)
        s = jnp.argmax(members).astype(jnp.int32)
        ok = (
            (acc_m[g] > 0)
            & (acc_m[g] >= min_rel_score * best_acc)
            & (members[s] > 0)
        )
        out_slots.append(jnp.where(ok, s, -1))
        out_scores.append(jnp.where(ok, members[s], -1.0))
        acc_m = acc_m.at[g].set(NEG)
        taken = taken.at[s].max(ok)
    return jnp.stack(out_slots), jnp.stack(out_scores)


@partial(jax.jit, static_argnames=("n_best",))
def _detect_simple(
    bow_mat: jnp.ndarray,
    present: jnp.ndarray,
    bow_q: jnp.ndarray,
    exclude: jnp.ndarray,
    min_rel_score: float,
    n_best: int,
):
    """Best-score policy without group accumulation (no covis available)."""
    alive = present & ~exclude
    scores = 1.0 - 0.5 * jnp.sum(jnp.abs(bow_mat - bow_q[None, :]), axis=-1)
    scores = jnp.where(alive, scores, -1.0)
    top_s, top_i = jax.lax.top_k(scores, n_best)
    best = top_s[0]
    ok = (top_s > 0) & (top_s >= min_rel_score * best)
    return jnp.where(ok, top_i.astype(jnp.int32), -1), jnp.where(ok, top_s, -1.0)


class KeyFrameDatabase:
    """Host-side wrapper holding the device-resident (KF, W) BoW matrix."""

    def __init__(self, vocab: np.ndarray, max_keyframes: int,
                 idf: np.ndarray | None = None):
        self.vocab = jnp.asarray(vocab)
        self.n_words = vocab.shape[0]
        self.bow_mat = jnp.zeros((max_keyframes, self.n_words), jnp.float32)
        self.present = np.zeros(max_keyframes, bool)
        self.present_dev = jnp.zeros(max_keyframes, bool)
        # idf word weights (DBoW2 stores these in the vocabulary file;
        # `TemplatedVocabulary.h` setNodeWeights)
        self.idf = jnp.asarray(idf, jnp.float32) if idf is not None else None

    # ------------------------------------------------------------------
    def compute_bow(self, desc: jnp.ndarray, valid: jnp.ndarray):
        """(words (N,), bow (W,)) for one frame's descriptors."""
        word, _ = V.transform(self.vocab, desc, valid)
        return word, V.bow_vector(word, self.n_words, idf=self.idf)

    def add(self, slot: int, bow: jnp.ndarray):
        """Register/overwrite keyframe `slot` (reference ``add``/``erase``)."""
        self.bow_mat = self.bow_mat.at[slot].set(bow)
        self.present[slot] = True
        self.present_dev = self.present_dev.at[slot].set(True)

    def erase(self, slot: int):
        self.bow_mat = self.bow_mat.at[slot].set(0.0)
        self.present[slot] = False
        self.present_dev = self.present_dev.at[slot].set(False)

    # ------------------------------------------------------------------
    def detect_candidates(
        self,
        bow_q: jnp.ndarray,
        exclude_mask,
        n_best: int = 3,
        min_rel_score: float = 0.75,
        covis=None,
    ):
        """Best-scoring non-excluded keyframes (loop/merge/reloc candidates).

        ``covis``: optional (KF, KF) covisibility-weight matrix (device or
        host); with it, the full ``DetectNBestCandidates`` group-accumulation
        policy runs (`/root/reference/src/KeyFrameDatabase.cc:611-700`),
        without it the simple best-score policy.  ONE device dispatch; only
        the winners come back to host.

        Returns (slots, scores) lists (possibly shorter than n_best).
        """
        exclude = jnp.asarray(np.asarray(exclude_mask, bool))
        if covis is None:
            slots, scores = _detect_simple(
                self.bow_mat, self.present_dev, bow_q, exclude,
                float(min_rel_score), n_best,
            )
        else:
            slots, scores = _detect_nbest(
                self.bow_mat, self.present_dev, bow_q, exclude,
                jnp.asarray(covis, jnp.float32), float(min_rel_score), n_best,
            )
        slots = np.asarray(slots)
        scores = np.asarray(scores)
        keep = slots >= 0
        return [int(s) for s in slots[keep]], [float(s) for s in scores[keep]]
