"""Multi-chip execution: photon data-parallelism over a device mesh.

TPU-native replacement for the reference's MPI layer (reference:
src/multipleProcesses_mpi.f95 + the master-worker scheduler in
Drivers/monteCarloDriver.f95:665-880). The mapping, per SURVEY.md section 2:

  * photon-batch data parallelism -> ``shard_map`` over an ICI mesh, one
    transport wave per device, domain replicated (domains are small),
  * the final ``sumAcrossProcesses`` tally reduce -> a single ``psum``
    inside the shard_map (rides ICI, replicated result),
  * the dynamic MPI master-worker work queue -> a *static deterministic
    schedule*: every (global batch, device) pair is an independent,
    globally-numbered sub-batch stream, so an N-device run produces
    bit-identical sums to a 1-device run of N x batches (the modern
    equivalent of the reference's (iseed, rank) stream reproducibility;
    reference: Drivers/monteCarloDriver.f95:901).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.domain.domain import OpticalDomain
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import (KernelConfig, Tallies,
                                               _run_batch_impl, run_batch)
from mcbrat3d_tpu.transport.local_estimate import IntensityConfig

PHOTON_AXIS = "photons"


def make_mesh(devices=None, axis_name: str = PHOTON_AXIS) -> Mesh:
    """1D photon-DP mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def resolve_mesh(mesh):
    """Normalize a mesh argument: None | Mesh | 'auto' -> Mesh or None.

    'auto' spans all local devices when more than one is present.
    """
    if mesh == "auto":
        return make_mesh() if len(jax.devices()) > 1 else None
    return mesh


def run_batch_sharded(domain: OpticalDomain,
                      surface: Surface,
                      source: illumination.Source,
                      seed,
                      global_batch: int,
                      config: KernelConfig,
                      mesh: Mesh,
                      intensity_config: Optional[IntensityConfig] = None,
                      intensity_dirs: Optional[jax.Array] = None,
                      n_photons=None) -> Tallies:
    """Non-jit wrapper: validates the radiance-direction mu floor on
    concrete values (see transport.pallas_kernel.dirs_mu_floor_ok), then
    dispatches to the jitted sharded implementation with the result as a
    static flag."""
    from mcbrat3d_tpu.transport import pallas_kernel as _pk
    if (intensity_config is not None
            and domain.tables.forward_orig.shape[1] == 1
            and not domain.all_hg):
        # all-HG domains evaluate the phase function analytically (see
        # transport.local_estimate._phase_value)
        raise ValueError(
            "intensity requested but the domain has no forward phase "
            "tables; build the domain with compute_intensity_tables=True")
    dirs_mu_ok = _pk.dirs_mu_floor_ok(intensity_config, intensity_dirs)
    if (intensity_config is not None
            and intensity_config.n_dirs > _pk.MAX_KERNEL_DIRS):
        # direction-chunked radiance (see integrator.run_batch): each
        # chunk is a full sharded pass over the same global photon set
        from mcbrat3d_tpu.transport.integrator import (
            _run_batch_dir_chunked)
        chunked = _run_batch_dir_chunked(
            domain, surface, source, config, intensity_config,
            intensity_dirs, dirs_mu_ok,
            lambda icfg_c, dirs_c: run_batch_sharded(
                domain, surface, source, seed, global_batch, config,
                mesh, icfg_c, dirs_c, n_photons))
        if chunked is not None:
            return chunked
    # Per-direction march plan from CONCRETE direction cosines: inside the
    # jitted sharded impl the dirs are tracers and plan_march would return
    # None, silently losing the per-direction bound optimization on
    # exactly the multi-chip runs it was built for.
    march_plan = None
    try:
        march_plan = _pk.plan_march(domain.grid, intensity_config,
                                    intensity_dirs)
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        pass
    return _run_batch_sharded_impl(
        domain, surface, source, seed, global_batch, config, mesh,
        intensity_config, intensity_dirs, n_photons,
        dirs_mu_ok=dirs_mu_ok, march_plan=march_plan)


@functools.partial(jax.jit,
                   static_argnames=("config", "intensity_config", "mesh",
                                    "dirs_mu_ok", "march_plan"))
def _run_batch_sharded_impl(domain: OpticalDomain,
                      surface: Surface,
                      source: illumination.Source,
                      seed,
                      global_batch: int,
                      config: KernelConfig,
                      mesh: Mesh,
                      intensity_config: Optional[IntensityConfig] = None,
                      intensity_dirs: Optional[jax.Array] = None,
                      n_photons=None,
                      dirs_mu_ok: bool = False,
                      march_plan=None) -> Tallies:
    """One *global* photon batch across the mesh.

    Each device traces ``config.photons_per_batch`` photons (or its share of
    the traced global ``n_photons``) as sub-batch stream
    ``global_batch * n_devices + device_index``; tallies are psum-ed over
    ICI and returned replicated. ``n_photons`` must not exceed
    n_devices * config.photons_per_batch (each device clamps its share to
    its lane capacity); concrete overshoots raise.
    """
    n_dev = mesh.devices.size
    if isinstance(n_photons, int) and n_photons > n_dev * config.photons_per_batch:
        raise ValueError(
            f"n_photons={n_photons} exceeds mesh capacity "
            f"{n_dev} * {config.photons_per_batch}; raise photons_per_lane "
            f"or split into more batches")

    def worker(domain, surface, source):
        d = jax.lax.axis_index(PHOTON_AXIS)
        key = rng.batch_key_traced(seed, global_batch * n_dev + d)
        if n_photons is None:
            n_local = None
        else:
            n_glob = jnp.asarray(n_photons, jnp.int32)
            n_local = n_glob // n_dev + (d < n_glob % n_dev).astype(jnp.int32)
        t = _run_batch_impl(domain, surface, source, key, config,
                            intensity_config, intensity_dirs,
                            n_photons=n_local, dirs_mu_ok=dirs_mu_ok,
                            march_plan=march_plan)
        return jax.tree.map(
            lambda x: jax.lax.psum(x, PHOTON_AXIS) if x is not None else None,
            t)

    fn = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P()),  # domain/surface/source replicated
        out_specs=P(),  # tallies replicated after psum
        check_vma=False,
    )
    return fn(domain, surface, source)
