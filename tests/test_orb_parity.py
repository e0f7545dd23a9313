"""Descriptor parity vs OpenCV ORB (the implementation the reference uses).

SURVEY §7 "hard part (4)": public ORB vocabularies are trained on OpenCV ORB
descriptors, so our rBRIEF must be bit-compatible.  This test computes OUR
descriptors at OpenCV's keypoints and compares bits.
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from orb_slam3_noted_tpu.ops import image as I
from orb_slam3_noted_tpu.ops import orb as O
from orb_slam3_noted_tpu.utils.synthetic import BoxRoom


def cv2_bits(desc_cv):
    """(N, 32) uint8 -> (N, 256) bits, OpenCV order (bit j of byte i)."""
    return np.unpackbits(desc_cv, axis=1, bitorder="little")


def our_bits(desc_u32):
    """(N, 8) uint32 -> (N, 256) bits in our pack order."""
    out = np.zeros((len(desc_u32), 256), np.uint8)
    for w in range(8):
        for b in range(32):
            out[:, 32 * w + b] = (desc_u32[:, w] >> b) & 1
    return out


@pytest.mark.parametrize("level", [0])
def test_descriptor_parity_level0(level):
    room = BoxRoom(seed=5)
    img = room.render(np.eye(3), np.zeros(3), (260.0, 260.0, 159.5, 119.5), 320, 240)
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)

    orb = cv2.ORB_create(
        nfeatures=300, scaleFactor=1.2, nlevels=8, edgeThreshold=19,
        patchSize=31, fastThreshold=20,
    )
    kps = orb.detect(img_u8, None)
    kps, desc_cv = orb.compute(img_u8, kps)
    sel = [i for i, k in enumerate(kps) if k.octave == level]
    assert len(sel) > 30
    kps0 = [kps[i] for i in sel]
    desc_cv0 = desc_cv[sel]

    imgf = jnp.asarray(img_u8.astype(np.float32))
    blur = I.gaussian_blur(imgf, 7, 2.0)
    xy = jnp.asarray([[k.pt[0], k.pt[1]] for k in kps0], jnp.float32)
    ang = jnp.deg2rad(jnp.asarray([k.angle for k in kps0], jnp.float32))
    ours = np.asarray(O.brief_descriptors(blur, jnp.round(xy), ang))

    d = (cv2_bits(desc_cv0) != our_bits(ours)).sum(axis=1)
    # allow a few bits of disagreement from blur-boundary rounding
    assert np.median(d) <= 8, f"median bit diff {np.median(d)}, mean {d.mean()}"
    assert (d <= 24).mean() > 0.9, d


def test_angle_parity():
    room = BoxRoom(seed=5)
    img = room.render(np.eye(3), np.zeros(3), (260.0, 260.0, 159.5, 119.5), 320, 240)
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)
    orb = cv2.ORB_create(nfeatures=300, scaleFactor=1.2, nlevels=8, fastThreshold=20)
    kps = orb.detect(img_u8, None)
    kps = [k for k in kps if k.octave == 0][:100]
    xy = jnp.asarray([[k.pt[0], k.pt[1]] for k in kps], jnp.float32)
    ours = np.rad2deg(np.asarray(O.ic_angles(jnp.asarray(img_u8, jnp.float32), xy)))
    ours = np.mod(ours, 360.0)
    theirs = np.asarray([k.angle for k in kps])
    diff = np.abs((ours - theirs + 180) % 360 - 180)
    assert np.median(diff) < 2.0, np.median(diff)
