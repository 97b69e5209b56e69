"""Test configuration: force an 8-virtual-device CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh (no TPU pod
needed), matching the reference's no-MPI stub-backend testing strategy
(reference: src/multipleProcesses_nompi.f95 + Makefile:165-182).

Note: this environment pre-imports jax at interpreter boot (sitecustomize
registers the remote-TPU PJRT plugin), so env vars alone are too late --
we must flip the already-imported config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
