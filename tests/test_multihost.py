"""Multi-host exercise: 2 jax.distributed CPU processes, one global mesh.

Proves the production multi-host path end-to-end without a cluster
(reference contract: src/multipleProcesses_mpi.f95 run at N ranks must equal
the serial nompi build; here a 2-process 4-device run must equal the
1-process 4-device run bit-for-bit, because sub-batch streams are keyed by
(seed, global device index) only).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("multihost"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # this environment's sitecustomize pre-imports jax and registers a TPU
    # relay backend at interpreter boot, which breaks
    # jax.distributed.initialize (must run before backend init) -- strip it
    # keep the repo root importable: script-mode workers get sys.path[0]
    # = tests/, so mcbrat3d_tpu must come from PYTHONPATH
    repo_root = os.path.dirname(_HERE)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p and p != repo_root])
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
             str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}\n{log[-4000:]}"
    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"worker{pid}.json")) as f:
            results.append(json.load(f))
    return results


def test_two_process_global_mesh(worker_outputs):
    r0, r1 = worker_outputs
    assert r0["process_count"] == 2 and r1["process_count"] == 2
    # psum replicates the global tallies: both processes see identical sums
    assert r0["n_photons"] == r1["n_photons"] == 4 * 128 * 4
    assert r0["flux_up_sum"] == pytest.approx(r1["flux_up_sum"], rel=1e-12)
    assert r0["flux_down_sum"] == pytest.approx(r1["flux_down_sum"],
                                                rel=1e-12)


def test_two_process_matches_single_process(worker_outputs):
    """The 2-process 4-device run equals a 1-process 4-device run exactly."""
    import jax

    from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
    from mcbrat3d_tpu.physics.surface import Surface
    from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
    from mcbrat3d_tpu.sources import illumination
    from mcbrat3d_tpu.transport.integrator import KernelConfig

    domain = make_step_cloud(ssa=0.99, n_cdf_steps=501)
    config = KernelConfig(n_lanes=128, photons_per_lane=4, max_steps=4000)
    mesh = make_mesh(jax.devices()[:4])
    t = run_batch_sharded(domain, Surface.lambertian(0.2),
                          illumination.directional(0.5, 0.0),
                          seed=7, global_batch=0, config=config, mesh=mesh)
    r0 = worker_outputs[0]
    assert int(t.n_photons) == r0["n_photons"]
    assert float(np.sum(np.asarray(t.flux_up, np.float64))) == \
        pytest.approx(r0["flux_up_sum"], rel=1e-6)
    assert float(np.sum(np.asarray(t.flux_down, np.float64))) == \
        pytest.approx(r0["flux_down_sum"], rel=1e-6)


def test_cross_host_moment_merge(worker_outputs):
    """MomentAccumulator.merge reproduces a serial accumulation of the same
    batches (the reference's sumAcrossProcesses of batch moments,
    Drivers/monteCarloDriver.f95:1151-1166)."""
    from mcbrat3d_tpu.core.accumulate import MomentAccumulator

    accs = []
    for r in worker_outputs:
        s = r["acc_state"]
        accs.append(MomentAccumulator.from_state_dict({
            "sum_w": s["sum_w"], "n_batches": s["n_batches"],
            "sum_wx": {k: np.asarray(v) for k, v in s["sum_wx"].items()},
            "sum_wx2": {k: np.asarray(v) for k, v in s["sum_wx2"].items()},
        }))
    merged = accs[0]
    merged.merge(accs[1])
    assert merged.n_batches == 2

    serial = MomentAccumulator()
    for r in worker_outputs:
        s = r["acc_state"]
        serial.add(s["sum_w"],
                   {"flux_up": np.asarray(s["sum_wx"]["flux_up"])
                    / s["sum_w"]})
    np.testing.assert_allclose(merged.mean("flux_up"),
                               serial.mean("flux_up"), rtol=1e-12)
    np.testing.assert_allclose(merged.stderr("flux_up"),
                               serial.stderr("flux_up"), rtol=1e-9, atol=0)
