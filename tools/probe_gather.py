"""Probe Mosaic per-lane gather options for the radiance march.

The in-kernel radiance estimator's cost is the per-crossing one-hot
gather (PERF_NOTES round-3); a true per-lane gather primitive is the
named next lever. Round-1 probes found take_along_axis(axis=1)
emulated-slow (~100 us / 65k) and take_along_axis(axis=0) crashed the
remote compiler; this script re-probes the options on the current
toolchain, each in its own subprocess-friendly section with timing by
host fetch.

Run on the TPU host: python tools/probe_gather.py [onehot|taa1|taa0]
Relay hazard: run EACH probe in a separate invocation with a >= 300 s
timeout and health-check between (see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 16
N_TAB = 1024  # 8 x 128 table (typical march-field block)
REPS = 200


def _run(kernel, idx, tab, interpret=False):
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BLK, 128), jnp.float32),
        interpret=interpret,
    )

    def body(i, acc):
        return acc + call(idx, tab)

    f = jax.jit(lambda: jax.lax.fori_loop(
        0, REPS, body, jnp.zeros((BLK, 128), jnp.float32)))
    out = f()
    t0 = time.time()
    out = f()
    s = float(jnp.sum(out))  # host fetch = honest sync
    dt = (time.time() - t0) / REPS
    return s, dt


def probe_onehot():
    """Baseline: factorized one-hot MXU gather (production)."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]
        lo = jnp.bitwise_and(idx, 127)
        hi = jnp.right_shift(idx, 7).astype(jnp.float32)
        iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 1)
        ohs = (lo[:, None, :] == iota).astype(jnp.bfloat16)
        rws = [jnp.dot(tab_ref[:].astype(jnp.bfloat16), ohs[b],
                       preferred_element_type=jnp.float32)
               for b in range(BLK)]
        t3 = jnp.stack(rws, axis=0)  # [BLK, 8, 128]
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, 8, 128), 1)
        out_ref[:] = jnp.sum(
            t3 * (rows.astype(jnp.float32) == hi[:, None, :]), axis=1)
    return kernel


def probe_taa1():
    """take_along_axis along the lane dim of a broadcast table row."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]
        flat = tab_ref[:].reshape(1, N_TAB)
        rows = jnp.broadcast_to(flat, (BLK, N_TAB))
        out_ref[:] = jnp.take_along_axis(
            rows, jnp.clip(idx, 0, N_TAB - 1), axis=1)[:, :128]
    return kernel


def probe_taa0():
    """take_along_axis along the sublane dim (crashed the compiler in
    round 1 -- re-check)."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]
        sub = jnp.right_shift(idx, 7)  # [BLK, 128] rows into the table
        out_ref[:] = jnp.take_along_axis(
            tab_ref[:], jnp.clip(sub[:8], 0, 7), axis=0)[:BLK]
    return kernel


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "onehot"
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, N_TAB, (BLK, 128)), jnp.int32)
    tab = jnp.asarray(rs.rand(8, 128), jnp.float32)
    kernel = {"onehot": probe_onehot, "taa1": probe_taa1,
              "taa0": probe_taa0}[which]()
    interpret = "--interpret" in sys.argv
    if interpret:  # correctness smoke only; timing is meaningless
        global REPS
        REPS = 2
    s, dt = _run(kernel, idx, tab, interpret=interpret)
    print(f"{which}: checksum {s:.3f}  {dt * 1e6:.1f} us/call "
          f"({BLK * 128} lanes)", flush=True)


if __name__ == "__main__":
    main()
