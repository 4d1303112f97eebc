"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; unit tests must be
hermetic and fast, so we pin the CPU backend with 8 virtual devices to
exercise the multi-chip sharding paths (SURVEY.md §4 implication list).

Note: this environment's sitecustomize pre-imports jax with the axon TPU
backend, so a plain JAX_PLATFORMS env var is ignored; jax.config.update
before first backend use is the reliable override.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
