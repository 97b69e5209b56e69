"""Wide-column gather probe: sliced one-hot MXU vs grouped dynamic_gather.

The separable kernel's flagship cost is the per-event column gather:
105,625 columns are sliced into 7 blocks of 16384 and each slice pays a
full bilinear one-hot MXU dot (transport/pallas_sep.py sliced_gather),
so the gather is O(n_columns x lanes) MACs -- 18.2 M photons/s at 1
slice collapses to 2.39 M/s at 7 (PERF_NOTES round 4).

Escape hatch: Mosaic's tpu.dynamic_gather supports same-shape 2D
take_along_axis along EITHER axis (axis 0 at <= 8 sublanes). A wide
[n_rows, 128] f32 table can then be gathered per-lane in GROUPS of 8
rows: per group, clip the row index into the group, one axis-0 pick,
one axis-1 (lane) pick, one select -- ~5 VPU vreg-ops per group instead
of 2*16384 MXU MACs per lane-slab per slice. For 832 rows (106,496
entries ~ the flagship) that is 104 unrolled groups.

Variants (each its own invocation; >= 300 s timeout between on TPU):
  sliced  production-shaped: 7 slices x (masked bf16 hi one-hot dot
          [2*128lo, 128hi] @ [128hi, p]) + lo-mask reduce, hi/lo value
          recombine (the sep kernel's exact-amp path)
  grp8    104 groups x (axis-0 pick + lane pick + select) on one f32
          table [832, 128] (dyn gather is exact f32: no hi/lo split)
  grp8x2  same but TWO independent tables (emission alias prob+alt)

Run on the TPU host: python tools/probe_gather3.py <which>
CPU correctness:     python tools/probe_gather3.py <which> --interpret
"""

from __future__ import annotations

import os
import sys
import time

if "--interpret" in sys.argv:
    # the sitecustomize pre-imports jax and registers the remote-TPU
    # plugin, so the env var alone is too late (conftest.py note);
    # flip the already-imported config before any backend initializes
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--interpret" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

BLK = int(os.environ.get("PROBE_BLK", "16"))
N_ROWS = 832                   # 832 * 128 = 106,496 ~ flagship columns
N_TAB = N_ROWS * 128
N_SL = 7                       # ceil(105625 / 16384)
INNER = int(os.environ.get("PROBE_INNER", "64"))
REPS = 8


def _perturb(idx0, v, mask):
    return jnp.bitwise_and(idx0 + (v * 997.0).astype(jnp.int32), mask)


def make_sliced():
    """Production-shaped sliced bilinear gather, nf=2 fields (amp hi/lo
    bf16 split recombined to the exact value)."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[:]
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 1)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128, 128), 1)

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            hi = jnp.bitwise_and(jnp.right_shift(idx, 7), 127)
            sl = jnp.right_shift(idx, 14)
            ohh = (hi[:, None, :] == iota_hi).astype(jnp.bfloat16)
            g3 = None
            for s in range(N_SL):
                mask_s = (sl == s).astype(jnp.bfloat16)
                part = [jnp.dot(tab_ref[s * 256:(s + 1) * 256],
                                ohh[b] * mask_s[b][None, :],
                                preferred_element_type=jnp.float32)
                        for b in range(BLK)]
                p3 = jnp.stack(part, axis=0)      # [BLK, 256, p]
                g3 = p3 if g3 is None else g3 + p3
            ohl = (lo[:, None, :] == iota_lo).astype(jnp.float32)
            vh = jnp.sum(g3[:, :128, :] * ohl, axis=1)
            vl = jnp.sum(g3[:, 128:, :] * ohl, axis=1)
            v = vh + vl
            return _perturb(idx0, v, N_TAB - 1), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel, (N_SL * 256, 128), "bf16split"


def _grp8_gather(tab_ref, row, lo, r0):
    """tab[row, lo] for row in [0, N_ROWS) via 8-row groups.

    tab_ref: [N_ROWS, 128] f32.  row, lo: [8, 128] int32 (one sublane
    slab).  Returns [8, 128] f32.
    """
    grp = jnp.right_shift(row, 3)
    sub = jnp.bitwise_and(row, 7)
    acc = jnp.zeros((8, 128), jnp.float32)
    for g in range(N_ROWS // 8):
        blkv = tab_ref[r0 + g * 8: r0 + (g + 1) * 8, :]     # [8,128]
        picked = jnp.take_along_axis(blkv, sub, axis=0)     # [8,128]
        v = jnp.take_along_axis(picked, lo, axis=1)
        acc = jnp.where(grp == g, v, acc)
    return acc


def make_grp8():
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[:]

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            row = jnp.right_shift(idx, 7)
            halves = []
            for h0 in range(0, BLK, 8):
                halves.append(_grp8_gather(
                    tab_ref, row[h0:h0 + 8], lo[h0:h0 + 8], 0))
            v = jnp.concatenate(halves, axis=0)
            return _perturb(idx0, v, N_TAB - 1), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel, (N_ROWS, 128), "f32"


def make_grp8x2():
    """Two independent field tables stacked rows [2*N_ROWS, 128]."""
    def kernel(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[:]

        def body(i, carry):
            idx, acc = carry
            lo = jnp.bitwise_and(idx, 127)
            row = jnp.right_shift(idx, 7)
            halves = []
            for h0 in range(0, BLK, 8):
                v1 = _grp8_gather(tab_ref, row[h0:h0 + 8],
                                  lo[h0:h0 + 8], 0)
                v2 = _grp8_gather(tab_ref, row[h0:h0 + 8],
                                  lo[h0:h0 + 8], N_ROWS)
                halves.append(v1 + v2)
            v = jnp.concatenate(halves, axis=0)
            return _perturb(idx0, v, N_TAB - 1), acc + v

        _, acc = jax.lax.fori_loop(
            0, INNER, body, (idx0, jnp.zeros((BLK, 128), jnp.float32)))
        out_ref[:] = acc
    return kernel, (2 * N_ROWS, 128), "f32"


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "grp8"
    interpret = "--interpret" in sys.argv
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, N_TAB, (BLK, 128)), jnp.int32)
    kernel, tab_shape, enc = {
        "sliced": make_sliced, "grp8": make_grp8,
        "grp8x2": make_grp8x2}[which]()
    vals = rs.rand(N_TAB).astype(np.float32)
    if enc == "bf16split":
        # rows [s*256 : s*256+128) = hi field M^T[lo, hi] of slice s;
        # rows [s*256+128 : (s+1)*256) = lo residual field
        vpad = np.zeros(N_SL * 128 * 128, np.float32)
        vpad[:N_TAB] = vals
        v2 = vpad.reshape(N_SL, 128, 128)          # [sl, hi, lo]
        hi16 = v2.astype(np.float32).astype(jnp.bfloat16)
        lo16 = (v2 - np.asarray(hi16, np.float32)).astype(jnp.bfloat16)
        tab = np.zeros(tab_shape, dtype=jnp.bfloat16)
        for s in range(N_SL):
            tab[s * 256:s * 256 + 128] = np.asarray(hi16[s]).T
            tab[s * 256 + 128:(s + 1) * 256] = np.asarray(lo16[s]).T
        tab = jnp.asarray(tab, jnp.bfloat16)
    else:
        n_fields = tab_shape[0] // N_ROWS
        tab = jnp.asarray(
            np.concatenate([vals.reshape(N_ROWS, 128)] * n_fields),
            jnp.float32)

    global INNER
    inner = 1 if interpret else INNER
    if interpret:
        INNER = 1
    call = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((BLK, 128), jnp.float32),
        interpret=interpret)
    f = jax.jit(lambda: call(idx, tab))
    t0 = time.time()
    out = f()
    s0 = float(jnp.sum(out))
    compile_s = time.time() - t0
    if interpret:
        # INNER=1: out is exactly one gather of vals[idx] (x2 for grp8x2)
        want = vals[np.asarray(idx)] * (2.0 if which == "grp8x2" else 1.0)
        tol = 2e-2 if enc == "bf16split" else 1e-6
        err = float(np.max(np.abs(np.asarray(out) - want)))
        assert err < tol, f"gather mismatch: max err {err}"
        print(f"{which}: interpret-mode gather EXACT (max err {err:.2e})")
    best = float("inf")
    for _ in range(1 if interpret else REPS):
        t0 = time.time()
        s0 = float(jnp.sum(f()))
        best = min(best, time.time() - t0)
    dt = best / inner
    print(f"{which}: checksum {s0:.3f}  {dt * 1e6:.3f} us/iter "
          f"compile={compile_s:.1f}s min_wall={best * 1e3:.1f} ms "
          f"({BLK * 128} lanes, INNER={inner})", flush=True)


if __name__ == "__main__":
    main()
