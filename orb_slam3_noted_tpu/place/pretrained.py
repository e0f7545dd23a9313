"""Shipped pretrained vocabulary loader.

The reference loads the ~10^6-word ``ORBvoc.txt`` at startup
(`/root/reference/src/System.cc:85-101`); this build ships a 32k-word bank
trained offline by ``scripts/train_vocab.py`` (hierarchical k-majority over
descriptors harvested from many synthetic viewpoints, flattened for exact
MXU argmin transform).  ``load_default_vocabulary`` returns it, or ``None``
when the asset is absent (callers fall back to on-the-fly training).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "vocab32k.npz")


@lru_cache(maxsize=1)
def load_default_vocabulary() -> np.ndarray | None:
    """(W, 8) uint32 packed centroid bank, or None if not shipped."""
    path = os.path.abspath(_ASSET)
    if not os.path.exists(path):
        return None
    with np.load(path) as f:
        return f["vocab"]
