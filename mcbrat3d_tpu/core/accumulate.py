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
