"""Worker process for the 2-process jax.distributed CPU test.

Each process contributes 2 virtual CPU devices to a 4-device global mesh,
runs one global sharded photon batch plus one process-local host batch, and
dumps its tallies / MomentAccumulator state for the parent to check
(reference analog: an MPI rank in src/multipleProcesses_mpi.f95:29-52 plus
the final sumAcrossProcesses moment reduction,
Drivers/monteCarloDriver.f95:1151-1166).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mcbrat3d_tpu.parallel import distributed

    # initialize BEFORE importing modules that build device constants at
    # import time (jax.distributed must run before any backend init)
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

    from mcbrat3d_tpu.core.accumulate import MomentAccumulator
    from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig
    assert jax.process_count() == nproc
    assert distributed.is_master() == (pid == 0)
    assert len(jax.devices()) == 2 * nproc  # global device view

    domain = make_step_cloud(ssa=0.99, n_cdf_steps=501)
    surface = Surface.lambertian(0.2)
    source = illumination.directional(0.5, 0.0)
    config = KernelConfig(n_lanes=128, photons_per_lane=4, max_steps=4000)

    # One GLOBAL batch over the cross-process mesh: the psum rides the
    # distributed backend; every process sees the replicated global tallies.
    mesh = make_mesh()
    t = run_batch_sharded(domain, surface, source, seed=7, global_batch=0,
                          config=config, mesh=mesh)
    distributed.synchronize()

    # One process-LOCAL host-side batch feeding a MomentAccumulator, merged
    # by the parent across processes (the reference's final reduce).
    acc = MomentAccumulator()
    acc.add(float(t.n_photons), {
        "flux_up": np.asarray(t.flux_up, np.float64) / float(t.n_photons)})
    state = acc.state_dict()

    out = {
        "pid": pid,
        "process_count": jax.process_count(),
        "n_photons": int(t.n_photons),
        "flux_up_sum": float(np.sum(np.asarray(t.flux_up, np.float64))),
        "flux_down_sum": float(np.sum(np.asarray(t.flux_down, np.float64))),
        "acc_state": {
            "sum_w": state["sum_w"],
            "n_batches": state["n_batches"],
            "sum_wx": {k: v.tolist() for k, v in state["sum_wx"].items()},
            "sum_wx2": {k: v.tolist() for k, v in state["sum_wx2"].items()},
        },
    }
    with open(os.path.join(outdir, f"worker{pid}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
