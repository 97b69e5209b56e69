"""Multi-device tests on the 8-device virtual CPU mesh.

The key contract (mirrors the reference's N-rank == N-serial-streams
property; reference: Drivers/monteCarloDriver.f95:901 seeding): a sharded
global batch over N devices produces exactly the sum of the N
correspondingly-numbered single-device sub-batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.parallel.mesh import make_mesh, run_batch_sharded
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch

pytestmark = pytest.mark.multichip

CFG = KernelConfig(n_lanes=1 << 10, photons_per_lane=2, max_steps=4000)


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    """The XLA CPU backend has segfaulted compiling shard_map programs
    late in the full suite (after ~240 tests' worth of live executables;
    rc=139 inside backend_compile, not reproducible in isolation).
    Dropping the jit caches before this module keeps the multi-device
    compiles on a fresh compiler state."""
    jax.clear_caches()
    yield


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_equals_serial_subbatches():
    dom = make_step_cloud(ssa=0.99)
    sfc = Surface.lambertian(0.2)
    src = illumination.directional(0.5, 0.0)
    mesh = make_mesh()
    n_dev = mesh.devices.size

    t_shard = run_batch_sharded(dom, sfc, src, seed=11, global_batch=3,
                                config=CFG, mesh=mesh)

    # Serial re-run of each device's sub-batch stream
    flux_up = np.zeros_like(np.asarray(t_shard.flux_up))
    n_tot = 0
    for d in range(n_dev):
        t = run_batch(dom, sfc, src, rng.batch_key(11, 3 * n_dev + d), CFG)
        flux_up += np.asarray(t.flux_up)
        n_tot += int(t.n_photons)

    assert int(t_shard.n_photons) == n_tot == n_dev * CFG.photons_per_batch
    np.testing.assert_allclose(np.asarray(t_shard.flux_up), flux_up,
                               rtol=1e-6)


def test_sharded_conservation():
    dom = make_step_cloud(ssa=1.0)
    sfc = Surface.lambertian(0.0)
    src = illumination.directional(0.866, 0.0)
    mesh = make_mesh()
    t = run_batch_sharded(dom, sfc, src, seed=0, global_batch=0,
                          config=CFG, mesh=mesh)
    n = int(t.n_photons)
    total = float(jnp.sum(t.flux_up)) + float(jnp.sum(t.flux_down))
    np.testing.assert_allclose(total, n, rtol=1e-5)


def test_sharded_megakernel_composes():
    """The production multi-chip configuration -- a pallas_call inside
    shard_map with a psum tally reduce -- compiles and executes
    (interpret-mode on the virtual CPU mesh) and matches the per-device
    serial megakernel sub-batches exactly."""
    dom = make_step_cloud(ssa=0.99, macro_factor=8)
    sfc = Surface.lambertian(0.0)
    src = illumination.directional(0.5, 0.0)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    cfg = KernelConfig(n_lanes=1 << 8, photons_per_lane=2, max_steps=4000,
                       use_pallas="on")

    t_shard = run_batch_sharded(dom, sfc, src, seed=7, global_batch=1,
                                config=cfg, mesh=mesh)

    flux_up = np.zeros_like(np.asarray(t_shard.flux_up))
    n_tot = 0
    for d in range(n_dev):
        t = run_batch(dom, sfc, src, rng.batch_key(7, n_dev + d), cfg)
        flux_up += np.asarray(t.flux_up)
        n_tot += int(t.n_photons)

    assert int(t_shard.n_photons) == n_tot == n_dev * cfg.photons_per_batch
    np.testing.assert_allclose(np.asarray(t_shard.flux_up), flux_up,
                               rtol=1e-6)


def test_sharded_n_photons_exact():
    """Traced global photon count splits exactly across devices."""
    from mcbrat3d_tpu.scenes.plane_parallel import make_slab
    dom = make_slab(tau=1.0, ssa=1.0, n_cdf_steps=201)
    mesh = make_mesh()
    cfg = KernelConfig(n_lanes=1 << 8, photons_per_lane=4, max_steps=2000)
    n_req = 1234
    t = run_batch_sharded(dom, Surface.lambertian(0.0),
                          illumination.directional(1.0, 0.0),
                          seed=0, global_batch=0, config=cfg, mesh=mesh,
                          n_photons=n_req)
    assert int(t.n_photons) == n_req


def test_sharded_dir_chunked_radiance():
    """> MAX_KERNEL_DIRS radiance on the mesh: chunked sharded passes
    concatenate per-chunk images and keep chunk 0's fluxes (same photon
    histories across chunks)."""
    from mcbrat3d_tpu.transport import pallas_kernel as pk
    from mcbrat3d_tpu.transport.local_estimate import (
        IntensityConfig, make_intensity_directions)
    dom = make_step_cloud(ssa=0.99, macro_factor=8,
                          compute_intensity_tables=True)
    sfc = Surface.lambertian(0.0)
    src = illumination.directional(0.5, 0.0)
    mesh = make_mesh()
    cfg = KernelConfig(n_lanes=1 << 8, photons_per_lane=1, max_steps=4000,
                       use_pallas="on")
    dirs = make_intensity_directions([1.0, 0.8, 0.6, 0.45],
                                     [0.0, 90.0, 180.0, 315.0])
    orig_cap = pk.MAX_KERNEL_DIRS
    pk.MAX_KERNEL_DIRS = 2
    try:
        icfg = IntensityConfig(n_dirs=4, use_russian_roulette=False,
                               use_hybrid_phase=False, pallas_min_mu=0.4)
        t = run_batch_sharded(dom, sfc, src, seed=7, global_batch=0,
                              config=cfg, mesh=mesh,
                              intensity_config=icfg, intensity_dirs=dirs)
        icfg2 = IntensityConfig(n_dirs=2, use_russian_roulette=False,
                                use_hybrid_phase=False, pallas_min_mu=0.4)
        t2 = run_batch_sharded(dom, sfc, src, seed=7, global_batch=0,
                               config=cfg, mesh=mesh,
                               intensity_config=icfg2,
                               intensity_dirs=dirs[:, 2:])
    finally:
        pk.MAX_KERNEL_DIRS = orig_cap
    assert t.intensity.shape[-1] == 4
    np.testing.assert_array_equal(np.asarray(t.intensity[:, :, 2:]),
                                  np.asarray(t2.intensity))
    np.testing.assert_array_equal(np.asarray(t.flux_up),
                                  np.asarray(t2.flux_up))
