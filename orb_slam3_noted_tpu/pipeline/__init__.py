"""SLAM pipeline: map state, tracking, local mapping, system facade.

The reference's three mutex-coupled pthreads (Tracking / LocalMapping /
LoopClosing, `/root/reference/src/System.cc:124-142`) become functional
stages over an immutable fixed-capacity map state: tracking produces per
-frame pose estimates from jitted kernels; keyframe insertion and local BA
transform the map state snapshot-to-snapshot (no locks — the JAX arrays are
immutable and stages exchange whole snapshots).
"""
