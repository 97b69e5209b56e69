"""Probe Mosaic per-lane gather options for the record/radiance gathers.

Round-4 finding: jax's Mosaic lowering DOES support lax.gather inside a
TPU kernel -- tpu.dynamic_gather -- but ONLY as a same-shape 2D
take_along_axis (indices.shape == operand.shape, axis 0 or 1; see
jax/_src/pallas/mosaic/lowering.py _gather_lowering_rule). The round-1
probes violated the shape contract (128-wide indices into a 1024-wide
table) and concluded "emulated-slow / crashes"; these probes use the
supported form and measure it against the production one-hot MXU
gather.

Probes (each its own invocation -- relay hazard; >= 300 s timeout and a
health check between):
  onehot  baseline: factorized one-hot MXU gather (production path)
  lane    take_along_axis axis=1, idx/operand both [BLK,128] (lo gather)
  sub     take_along_axis axis=0, idx/operand both [BLK,128] (hi gather)
  row8    1024-entry table: 8 broadcast rows, 8 lane-gathers + hi-select
  wide    [BLK,1024] operand, idx in 0..1023 (cross-vreg lane gather)

Run on the TPU host (package pip-installed -e): python tools/probe_gather.py <which>
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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


def probe_lane():
    """Supported form: same-shape take_along_axis along the LANE dim.
    out[i,j] = row_i[ lo[i,j] ] with operand/indices both [BLK,128]."""
    def kernel(idx_ref, tab_ref, out_ref):
        lo = jnp.bitwise_and(idx_ref[:], 127)
        rows = jnp.broadcast_to(tab_ref[0:1, :], (BLK, 128))
        out_ref[:] = jnp.take_along_axis(rows, lo, axis=1)
    return kernel


def probe_sub():
    """Supported form: same-shape take_along_axis along the SUBLANE dim.
    out[i,j] = tab[ hi[i,j], j ] with operand/indices both [BLK,128]."""
    def kernel(idx_ref, tab_ref, out_ref):
        hi = jnp.clip(jnp.right_shift(idx_ref[:], 7), 0, BLK - 1)
        tab16 = jnp.concatenate([tab_ref[:], tab_ref[:]], axis=0)  # [16,128]
        out_ref[:] = jnp.take_along_axis(tab16, hi, axis=0)
    return kernel


def probe_row8():
    """Full 1024-entry gather: 8 broadcast rows, 8 lane-gathers, select
    by hi. out[i,j] = tab[hi, lo]."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]
        lo = jnp.bitwise_and(idx, 127)
        hi = jnp.right_shift(idx, 7)
        acc = jnp.zeros((BLK, 128), jnp.float32)
        for h in range(8):
            rows = jnp.broadcast_to(tab_ref[h:h + 1, :], (BLK, 128))
            v = jnp.take_along_axis(rows, lo, axis=1)
            acc = jnp.where(hi == h, v, acc)
        out_ref[:] = acc
    return kernel


def probe_wide():
    """Cross-vreg lane gather: operand [BLK,1024], idx 0..1023. May be
    unsupported/slow -- run LAST."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx = idx_ref[:]
        flat = tab_ref[:].reshape(1, N_TAB)
        rows = jnp.broadcast_to(flat, (BLK, N_TAB))
        idx_w = jnp.pad(idx, ((0, 0), (0, N_TAB - 128)))
        out_ref[:] = jnp.take_along_axis(rows, idx_w, axis=1)[:, :128]
    return kernel


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "onehot"
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, N_TAB, (BLK, 128)), jnp.int32)
    tab = jnp.asarray(rs.rand(8, 128), jnp.float32)
    kernel = {"onehot": probe_onehot, "lane": probe_lane,
              "sub": probe_sub, "row8": probe_row8,
              "wide": probe_wide}[which]()
    interpret = "--interpret" in sys.argv
    if interpret:  # correctness smoke only; timing is meaningless
        global REPS
        REPS = 2
    s, dt = _run(kernel, idx, tab, interpret=interpret)
    print(f"{which}: checksum {s:.3f}  {dt * 1e6:.1f} us/call "
          f"({BLK * 128} lanes)", flush=True)


if __name__ == "__main__":
    main()
