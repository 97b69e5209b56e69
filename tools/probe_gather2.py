"""Marginal-cost probe: one-hot MXU gather vs dynamic_gather, looped
INSIDE one kernel so launch overhead amortizes away.

tools/probe_gather.py measured ~2.2 ms/call for EVERY variant -- the
fori-of-pallas_call harness is launch-dominated. Here the kernel body
runs INNER gather iterations with a data dependence (the next index is
perturbed by the previous value) so Mosaic cannot hoist or elide them;
per-iteration time = wall / (REPS * INNER).

Variants:
  onehot  production-style: [8,128] table, per-blk-row MXU dot + hi mask
  row8    8 broadcast rows, 8 lane dynamic_gathers + hi-select
  lane    single 128-entry lane gather (march z-table shape)

Run on the TPU host: python tools/probe_gather2.py <which>
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import os

BLK = int(os.environ.get("PROBE_BLK", "16"))
N_TAB = 1024
INNER = int(os.environ.get("PROBE_INNER", "256"))
REPS = 8


def _perturb(idx0, v, mask):
    # data dependence: fold the gathered value's bits into the index
    return jnp.bitwise_and(
        idx0 + (v * 997.0).astype(jnp.int32), mask)


def make_onehot():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[:]
        tab = tab_ref[:]

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            hi = jnp.right_shift(idx, 7).astype(jnp.float32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 1)
            ohs = (lo[:, None, :] == iota).astype(jnp.bfloat16)
            rws = [jnp.dot(tab.astype(jnp.bfloat16), ohs[b],
                           preferred_element_type=jnp.float32)
                   for b in range(BLK)]
            t3 = jnp.stack(rws, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, 8, 128), 1)
            v = jnp.sum(
                t3 * (rows.astype(jnp.float32) == hi[:, None, :]), axis=1)
            return _perturb(idx0, v, N_TAB - 1), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def make_row8():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[:]
        rows8 = [jnp.broadcast_to(tab_ref[h:h + 1, :], (BLK, 128))
                 for h in range(8)]

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            hi = jnp.right_shift(idx, 7)
            v = jnp.zeros((BLK, 128), jnp.float32)
            for h in range(8):
                g = jnp.take_along_axis(rows8[h], lo, axis=1)
                v = jnp.where(hi == h, g, v)
            return _perturb(idx0, v, N_TAB - 1), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def make_lane():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = jnp.bitwise_and(idx_ref[:], 127)
        rows = jnp.broadcast_to(tab_ref[0:1, :], (BLK, 128))

        def body(i, carry):
            idx, acc = carry
            v = jnp.take_along_axis(rows, idx, axis=1)
            return _perturb(idx0, v, 127), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "row8"
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, N_TAB, (BLK, 128)), jnp.int32)
    tab = jnp.asarray(rs.rand(8, 128), jnp.float32)
    kernel = {"onehot": make_onehot, "row8": make_row8,
              "lane": make_lane}[which]()
    interpret = "--interpret" in sys.argv
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((BLK, 128), jnp.float32),
        interpret=interpret)
    reps = 1 if interpret else REPS
    f = jax.jit(lambda: call(idx, tab))
    out = f()
    s0 = float(jnp.sum(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        s0 = float(jnp.sum(f()))
        best = min(best, time.time() - t0)
    dt = best / INNER
    print(f"{which}: checksum {s0:.3f}  {dt * 1e6:.3f} us/iter "
          f"min_wall={best * 1e3:.1f} ms "
          f"({BLK * 128} lanes, INNER={INNER})", flush=True)


if __name__ == "__main__":
    main()
