"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / the driver; unit tests must be
hermetic and run anywhere, so we pin the CPU backend with 8 virtual devices
to exercise the multi-chip sharding paths (SURVEY.md §4 implication list).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
