"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native replacement for "multi-node testing without a
cluster" — sharding/pjit paths are exercised against 8 virtual CPU devices.

NOTE: this environment's sitecustomize prepends the 'axon' TPU platform to
``jax_platforms`` regardless of the JAX_PLATFORMS env var, so the env-var
route silently leaves tests on the TPU.  ``jax.config.update`` after import
(but before backend initialization) wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"
