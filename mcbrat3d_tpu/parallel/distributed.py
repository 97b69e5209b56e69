"""Multi-host orchestration.

The reference scales across nodes with MPI ranks (reference:
src/multipleProcesses_mpi.f95; 20,000 ranks on Blue Waters per
run/I3RC_mono_perf.deck). The TPU-native equivalent is `jax.distributed`:
each host process joins the global runtime, the photon-DP mesh spans all
chips, `psum` rides ICI within a slice and DCN across hosts, and host-side
batch statistics merge with MomentAccumulator.merge (an all-gather-free
reduction done once at the end, like the reference's final
sumAcrossProcesses).

Single-host runs need none of this; these helpers are thin and safe to call
unconditionally.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join the multi-host runtime (initializeProcesses equivalent;
    reference: src/multipleProcesses_mpi.f95:29-52). No-op when
    single-process and no coordinator is configured."""
    if num_processes is None and coordinator_address is None:
        return  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_master() -> bool:
    """MasterProc equivalent."""
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (synchronizeProcesses equivalent)."""
    if jax.process_count() > 1:
        # A tiny psum over all devices acts as a barrier.
        from jax.sharding import Mesh, PartitionSpec as P
        import numpy as np
        mesh = Mesh(np.asarray(jax.devices()), ("all",))
        fn = jax.shard_map(lambda: jax.lax.psum(jax.numpy.ones(()), "all"),
                           mesh=mesh, in_specs=(), out_specs=P())
        fn().block_until_ready()
