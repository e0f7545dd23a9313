"""Regenerate MULTICHIP_SCALING.json (the >=80% scaling gate evidence).

Runs the full-capacity (256 KF / 16k MP / 307k obs) distributed GBA and the
edge-sharded pose graph on a 1-device vs an 8-device virtual CPU mesh and
records the fixed-size time ratio.  Split out of the driver's
``dryrun_multichip`` validation because one capacity GBA call is a
multi-minute CPU run; run this on an otherwise idle machine:

    python scripts/measure_scaling.py [n_devices]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()
os.environ["ORB_TPU_SCALING"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g  # noqa: E402

g.dryrun_multichip(n)
print(open("MULTICHIP_SCALING.json").read())
