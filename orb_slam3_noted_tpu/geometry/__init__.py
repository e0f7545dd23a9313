"""Lie-group geometry core (SO3 / SE3 / Sim3) and multi-view primitives.

All functions are pure jnp, dtype-preserving, and safe under ``jax.jit`` /
``jax.vmap`` — batched variants are obtained with ``vmap`` rather than
bespoke loops.  Small-angle branches use Taylor expansions selected with
``jnp.where`` so gradients stay finite.
"""

from orb_slam3_noted_tpu.geometry import so3, se3, sim3  # noqa: F401
from orb_slam3_noted_tpu.geometry.triangulation import triangulate_dlt  # noqa: F401
from orb_slam3_noted_tpu.geometry.horn import horn_sim3  # noqa: F401
