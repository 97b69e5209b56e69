"""MCBRaT3D-TPU: TPU-native broadband Monte Carlo radiative transfer in 3D.

A ground-up JAX/XLA re-design of the capabilities of MCBRaT3D (Alexandra
Jones' broadband extension of the I3RC community Monte Carlo model;
reference: /root/reference). Photon transport runs as a wave-based
megakernel on TPU (struct-of-arrays photon state advanced in a
``lax.while_loop`` with masked selects and counter-based RNG streams);
multi-chip scaling uses ``shard_map`` photon data-parallelism with ``psum``
tally reductions over ICI instead of the reference's MPI master-worker
scheduler.
"""

__version__ = "0.1.0"

from mcbrat3d_tpu.core.grid import Grid
from mcbrat3d_tpu.domain.domain import OpticalDomain, OpticalComponent
from mcbrat3d_tpu.physics.phase_function import (
    PhaseFunction,
    PhaseFunctionTable,
)
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import Integrator, Tallies

__all__ = [
    "Grid",
    "OpticalDomain",
    "OpticalComponent",
    "PhaseFunction",
    "PhaseFunctionTable",
    "illumination",
    "Integrator",
    "Tallies",
]
