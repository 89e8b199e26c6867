"""Test configuration: run everything on a simulated 8-device CPU platform.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count flag, per the build plan (SURVEY.md §4).  Pallas kernels run in
interpret mode on CPU (tests set interpret=True explicitly).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
