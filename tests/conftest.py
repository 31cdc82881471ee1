"""Test configuration: force the JAX CPU backend with 8 virtual devices
so multi-device sharding is exercised without TPU hardware.

The driver environment pre-imports jax via sitecustomize with an
experimental TPU platform pinned (JAX_PLATFORMS=axon), so setting env
vars here is too late for the platform choice — update the live jax
config instead (backends are not initialised until first use)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
