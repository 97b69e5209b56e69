"""Checkpoint / resume of long runs.

The reference designed (but left commented out) periodic checkpointing of
the accumulated moments (reference: Drivers/monteCarloDriver.f95:127-134,
753-801) and an unused RNG-state save (RandomNumbersForMC.f95:303-348).
Here it is real and trivial: the counter-based RNG needs no state (streams
are a pure function of (seed, batch index)), so a checkpoint is just the
moment accumulator + the next batch index, written atomically with an
alternating pair of files the way the reference intended.
"""

from __future__ import annotations

import os

import numpy as np

from mcbrat3d_tpu.core.accumulate import MomentAccumulator


def save_checkpoint(path: str, next_batch: int, acc: MomentAccumulator,
                    chunk_size: int = 0) -> None:
    """``chunk_size`` records the schedule geometry (photons per global
    batch = per-device batch x device count); broadband resume validates it
    so a checkpoint is never resumed under a different work layout."""
    state = acc.state_dict()
    payload = {
        "next_batch": np.int64(next_batch),
        "chunk_size": np.int64(chunk_size),
        "sum_w": np.float64(state["sum_w"]),
        "n_batches": np.int64(state["n_batches"]),
    }
    for k, v in state["sum_wx"].items():
        payload[f"wx:{k}"] = v
    for k, v in state["sum_wx2"].items():
        payload[f"wx2:{k}"] = v
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, with_meta: bool = False):
    """Returns (next_batch, MomentAccumulator[, chunk_size])."""
    with np.load(path) as z:
        state = {
            "sum_w": float(z["sum_w"]),
            "n_batches": int(z["n_batches"]),
            "sum_wx": {k[3:]: z[k] for k in z.files if k.startswith("wx:")},
            "sum_wx2": {k[4:]: z[k] for k in z.files if k.startswith("wx2:")},
        }
        acc = MomentAccumulator.from_state_dict(state)
        if with_meta:
            chunk = int(z["chunk_size"]) if "chunk_size" in z.files else 0
            return int(z["next_batch"]), acc, chunk
        return int(z["next_batch"]), acc
