"""Test configuration: run everything on a simulated 8-device CPU platform.

Multi-chip sharding is validated without TPU hardware via XLA's host-platform
device-count flag, per the build plan (SURVEY.md §4).  Pallas kernels run in
interpret mode on CPU (tests set interpret=True explicitly).

The box pre-sets JAX_PLATFORMS=axon (remote-TPU tunnel) and a sitecustomize
registers the plugin unconditionally, so plain env vars are not enough:
jax.config must be updated before any backend initialises.  Unit tests must
be hermetic and CPU-local; the TPU compile path is exercised by the CLI and
the bench harness instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
