"""Test bootstrap: run everything on a simulated 8-device CPU mesh.

The reference never tested distributed execution (its README flags multi-GPU
as broken — /root/reference/README.md:81).  JAX lets us validate every mesh/
collective path on CPU via ``--xla_force_host_platform_device_count``; these
env vars must be set before jax initializes, hence this conftest.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (after env setup)

# The container's sitecustomize registers the 'axon' TPU plugin and forces
# jax_platforms="axon,cpu" from inside register(); env vars alone cannot win,
# so re-force CPU through the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
