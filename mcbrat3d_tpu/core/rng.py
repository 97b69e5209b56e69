"""Counter-based random number streams for Monte Carlo transport.

The reference model uses a Mersenne Twister (MT19937) seeded per
(iseed, rank, thread) (reference: src/RandomNumbersForMC.f95:86-241).
Sequential-state generators do not map to SIMD waves, so we use JAX's
counter-based threefry: every (batch, step, purpose) tuple deterministically
derives an independent stream via ``fold_in``.  Reproducibility is a function
of (seed, global batch index) only -- independent of device count or lane
count, matching the reference's requirement that an N-rank run equal N serial
batch streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Purpose tags: each random draw site in the transport kernel gets its own
# stream so that adding a new draw site never perturbs existing streams.
TAU = 0
COLLISION = 1
COMPONENT = 2
SCAT_ANGLE = 3
SCAT_AZIMUTH = 4
ROULETTE = 5
SURFACE_MU = 6
SURFACE_PHI = 7
SOURCE = 8
INTENSITY_RR = 9

TINY = np.float32(1.1754944e-38)  # smallest normal f32; lower bound for log()


def batch_key(seed, batch_index) -> jax.Array:
    """Key for one photon batch. (seed, batch) -> independent stream.

    Works with traced (device-dependent) indices too, so a device's
    sub-batch stream in a sharded run is identical to the same-numbered
    batch of a single-device run.
    """
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.key(0), seed), batch_index)


batch_key_traced = batch_key


def step_key(bkey: jax.Array, step, purpose: int) -> jax.Array:
    """Key for one wave step and draw site within a batch."""
    return jax.random.fold_in(jax.random.fold_in(bkey, step), purpose)


def uniform(key: jax.Array, shape, lo=0.0, hi=1.0) -> jax.Array:
    """U[lo, hi) in float32."""
    return jax.random.uniform(key, shape, dtype=jnp.float32, minval=lo, maxval=hi)


def uniform_open(key: jax.Array, shape) -> jax.Array:
    """U(0, 1]: never returns exactly 0, safe for -log(u).

    Mirrors the reference's ``max(tiny(x), getRandomReal(...))`` guard
    (reference: Integrators/monteCarloRadiativeTransfer.f95:554).
    """
    return 1.0 - jax.random.uniform(key, shape, dtype=jnp.float32)


def exponential_deviate(key: jax.Array, shape) -> jax.Array:
    """Optical-depth free path: -log(U(0,1])."""
    return -jnp.log(uniform_open(key, shape))
