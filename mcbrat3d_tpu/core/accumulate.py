"""Numerically careful accumulation helpers.

The reference protects its long spectral and emission sums with Kahan
compensation (reference: src/emissionAndBroadBandWeights.f95:188-197,
505-508; Drivers/monteCarloDriver.f95:423-433). On the host side we use
float64 Kahan / pairwise sums; in-kernel tallies stay float32 per batch and
are promoted to float64 across batches (matching the reference's
batch-moment structure, Drivers/monteCarloDriver.f95:1023-1052).
"""

from __future__ import annotations

import numpy as np


def kahan_cumsum(x: np.ndarray, block: int = 65536) -> np.ndarray:
    """Compensated (Kahan-Neumaier) cumulative sum along the last axis.

    Neumaier's variant also survives the case where the running sum is
    smaller than the incoming term, which plain Kahan mishandles.

    Long 1D inputs (production LW domains flatten ~16M voxels into one
    emission CDF) use a blocked formulation: vectorized f64 ``np.cumsum``
    within each block (error <= block * eps, ~1e-11 relative) plus a
    Neumaier-compensated carry across blocks, so the global error stays at
    the compensated level without a 16M-iteration Python loop.
    """
    x = np.asarray(x, np.float64)
    if x.ndim == 1 and x.size > 4 * block:
        out = np.empty_like(x)
        s = 0.0
        c = 0.0
        for i0 in range(0, x.size, block):
            seg = np.cumsum(x[i0:i0 + block])
            out[i0:i0 + block] = (s + c) + seg
            v = float(seg[-1])
            t = s + v
            c += (s - t) + v if abs(s) >= abs(v) else (v - t) + s
            s = t
        return out
    out = np.empty_like(x)
    s = np.zeros(x.shape[:-1], np.float64)
    c = np.zeros(x.shape[:-1], np.float64)
    for i in range(x.shape[-1]):
        v = x[..., i]
        t = s + v
        c = c + np.where(np.abs(s) >= np.abs(v), (s - t) + v, (v - t) + s)
        s = t
        out[..., i] = s + c
    return out


class MomentAccumulator:
    """Photon-weighted first/second moments over batches (host-side, f64).

    Matches the driver's accumulation of sum(w*x) and sum(w*x^2) per batch,
    where w is the batch photon count (reference:
    Drivers/monteCarloDriver.f95:1023-1052), and the mean/stderr finalization
    mean = sum(w x)/sum(w), stderr = sqrt(max(0, E[x^2]-E[x]^2)/(n-1))
    (reference: Drivers/monteCarloDriver.f95:1188-1228).
    """

    def __init__(self):
        self._sum_wx = {}
        self._sum_wx2 = {}
        self._sum_w = 0.0
        self._n_batches = 0

    def add(self, weight: float, arrays: dict):
        self._sum_w += float(weight)
        self._n_batches += 1
        for name, arr in arrays.items():
            a = np.asarray(arr, np.float64)
            if name not in self._sum_wx:
                self._sum_wx[name] = np.zeros_like(a)
                self._sum_wx2[name] = np.zeros_like(a)
            self._sum_wx[name] += weight * a
            self._sum_wx2[name] += weight * a * a

    @property
    def n_batches(self) -> int:
        return self._n_batches

    @property
    def total_weight(self) -> float:
        return self._sum_w

    def mean(self, name: str) -> np.ndarray:
        return self._sum_wx[name] / self._sum_w

    def stderr(self, name: str) -> np.ndarray:
        if self._n_batches < 2:
            return np.zeros_like(self._sum_wx[name])
        ex = self._sum_wx[name] / self._sum_w
        ex2 = self._sum_wx2[name] / self._sum_w
        var = np.maximum(0.0, ex2 - ex * ex)
        return np.sqrt(var / (self._n_batches - 1))

    def merge(self, other: "MomentAccumulator") -> None:
        """Combine another accumulator into this one (cross-host reduction)."""
        self._sum_w += other._sum_w
        self._n_batches += other._n_batches
        for name in other._sum_wx:
            if name not in self._sum_wx:
                self._sum_wx[name] = other._sum_wx[name].copy()
                self._sum_wx2[name] = other._sum_wx2[name].copy()
            else:
                self._sum_wx[name] += other._sum_wx[name]
                self._sum_wx2[name] += other._sum_wx2[name]

    def state_dict(self) -> dict:
        """Serializable state for checkpoint/resume."""
        return {
            "sum_w": self._sum_w,
            "n_batches": self._n_batches,
            "sum_wx": dict(self._sum_wx),
            "sum_wx2": dict(self._sum_wx2),
        }

    @staticmethod
    def from_state_dict(state: dict) -> "MomentAccumulator":
        acc = MomentAccumulator()
        acc._sum_w = float(state["sum_w"])
        acc._n_batches = int(state["n_batches"])
        acc._sum_wx = {k: np.asarray(v, np.float64) for k, v in state["sum_wx"].items()}
        acc._sum_wx2 = {k: np.asarray(v, np.float64) for k, v in state["sum_wx2"].items()}
        return acc


class DeviceMomentAccumulator:
    """Device-resident moment accumulation for per-bin transport loops.

    The broadband loop used to sync the device every batch --
    ``int(t.n_photons)`` plus one host fetch per tally array plus ~7
    eager ``normalized()`` dispatches, each ~100 ms through a
    relay-attached device -- so at flagship scale (64 bins) the per-bin
    FIXED cost dwarfed transport itself (PERF_NOTES round 4: ~1.76 s/bin
    vs ~0.07 s of device time). This variant keeps f32
    Neumaier-compensated (sum, carry) pairs for sum(w x) / sum(w x^2) /
    sum(w) ON DEVICE and enqueues ONE fused jitted update per batch
    (normalize + moments, no sync, no fetch) -- jax async dispatch then
    overlaps it with the next bin's host-side rebuild. ``finalize()``
    pulls everything into a host f64 MomentAccumulator exactly once.

    Accuracy: compensated f32 summation keeps ~f32-eps TOTAL error on
    each moment (vs sqrt(n)*eps uncompensated), and the f64 finalize adds
    s + c exactly; batch-mean variances are O(1) relative (inter-bin
    spread), so the ex2 - ex^2 cancellation stays benign.
    Matches the reference's batch-moment structure
    (reference: Drivers/monteCarloDriver.f95:1023-1052).
    """

    def __init__(self, base: "MomentAccumulator" = None):
        self._base = base if base is not None else MomentAccumulator()
        self._state = None  # {name: (s_wx, c_wx, s_wx2, c_wx2)}
        self._w_state = None  # (s_w, c_w) f32 scalars
        self._n_batches = 0
        self._update = None

    @staticmethod
    def _neumaier(s, c, v):
        import jax.numpy as jnp
        t = s + v
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(v),
                          (s - t) + v, (v - t) + s)
        return t, c

    def _make_update(self):
        import jax

        def upd(state, w_state, weight, arrays):
            import jax.numpy as jnp
            s_w, c_w = w_state
            s_w, c_w = self._neumaier(s_w, c_w, weight)
            new = {}
            for name, vals in state.items():
                if name in arrays:
                    a = jnp.asarray(arrays[name], jnp.float32)
                    s1, c1, s2, c2 = vals
                    s1, c1 = self._neumaier(s1, c1, weight * a)
                    s2, c2 = self._neumaier(s2, c2, weight * a * a)
                    new[name] = (s1, c1, s2, c2)
                else:
                    # a key this batch's tally layout lacks (e.g. fast
                    # paths without the 3D volume field): carry through
                    new[name] = vals
            return new, (s_w, c_w)

        return jax.jit(upd, donate_argnums=(0, 1))

    def add(self, weight, arrays: dict):
        """Enqueue one batch's moments. ``weight`` may be a device scalar
        (e.g. Tallies.n_photons); ``arrays`` jnp arrays. No host sync."""
        import jax.numpy as jnp
        weight = jnp.asarray(weight, jnp.float32)
        if self._w_state is None:
            self._w_state = (jnp.zeros((), jnp.float32),
                             jnp.zeros((), jnp.float32))
            self._state = {}
        for name, a in arrays.items():
            if name not in self._state:
                # four DISTINCT buffers: donation rejects the same buffer
                # appearing twice in one call
                self._state[name] = tuple(
                    jnp.zeros(jnp.shape(a), jnp.float32) for _ in range(4))
        if self._update is None:
            self._update = self._make_update()
        self._state, self._w_state = self._update(
            self._state, self._w_state, weight,
            {k: jnp.asarray(v, jnp.float32) for k, v in arrays.items()})
        self._n_batches += 1

    def add_tallies(self, t, grid):
        """Fused per-batch update from raw Tallies: per-column
        normalization (Tallies.normalized) + driver array layout
        (means, absorption profile) + moment update, all inside one
        jitted dispatch."""
        import jax
        import jax.numpy as jnp

        if getattr(self, "_tally_update", None) is None:
            def upd(t_, grid_):
                tn = t_.normalized(grid_)
                arrays = {
                    "flux_up": tn.flux_up,
                    "flux_down": tn.flux_down,
                    "flux_absorbed": tn.flux_absorbed,
                    "mean_flux_up": jnp.mean(tn.flux_up),
                    "mean_flux_down": jnp.mean(tn.flux_down),
                    "mean_flux_absorbed": jnp.mean(tn.flux_absorbed),
                }
                if tn.volume_absorption is not None:
                    arrays["volume_absorption"] = tn.volume_absorption
                if tn.absorption_profile is not None:
                    arrays["absorption_profile"] = tn.absorption_profile
                elif tn.volume_absorption is not None:
                    arrays["absorption_profile"] = jnp.mean(
                        tn.volume_absorption, axis=(0, 1))
                if tn.intensity is not None:
                    arrays["intensity"] = tn.intensity
                return arrays, tn.n_photons.astype(jnp.float32)

            self._tally_update = jax.jit(upd)
        arrays, w = self._tally_update(t, grid)
        self.add(w, arrays)

    @property
    def n_batches(self) -> int:
        return self._n_batches + self._base.n_batches

    def finalize(self) -> "MomentAccumulator":
        """One host sync: fold the device sums into a host f64
        MomentAccumulator (merged with any resume base)."""
        out = MomentAccumulator()
        out.merge(self._base)
        if self._w_state is None:
            return out
        dev = MomentAccumulator()
        s_w, c_w = self._w_state
        dev._sum_w = float(np.float64(np.asarray(s_w))
                           + np.float64(np.asarray(c_w)))
        dev._n_batches = self._n_batches
        for name, (s1, c1, s2, c2) in self._state.items():
            dev._sum_wx[name] = (np.asarray(s1, np.float64)
                                 + np.asarray(c1, np.float64))
            dev._sum_wx2[name] = (np.asarray(s2, np.float64)
                                  + np.asarray(c2, np.float64))
        out.merge(dev)
        return out

    # checkpoint duck-typing (driver/checkpoint.save_checkpoint)
    def state_dict(self) -> dict:
        return self.finalize().state_dict()
