"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native replacement for "multi-node testing without a
cluster" — sharding/pjit paths are exercised against
``--xla_force_host_platform_device_count=8``.
"""

import os

# Force CPU even when the environment pre-sets a TPU platform (e.g. "axon").
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
