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

import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _bounded_compiler_state():
    """Drop compiled executables after every test module.

    The suite compiles hundreds of XLA CPU programs (three Pallas kernel
    families in interpret mode are the big ones); with all of them pinned
    by jit caches in one long process, XLA's CPU backend segfaulted
    inside backend_compile_and_load twice near the ~40-minute mark
    (cumulative JIT state -- the same compiles are fine standalone).
    Clearing per module bounds the live-executable set."""
    yield
    jax.clear_caches()
    gc.collect()
