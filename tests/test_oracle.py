"""Statistical cross-validation against an independent scalar implementation.

The reference validates by intercomparison (I3RC community results); we
cannot bit-match a different RNG, so the acceptance criterion is agreement
within Monte Carlo noise (SURVEY.md section 4 / BASELINE.md). This module
implements a deliberately simple, scalar, pure-NumPy photon tracer -- an
independent second implementation of the same physics -- and requires the
TPU kernel's domain-mean fluxes to agree within combined 3-4 sigma.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcbrat3d_tpu.core import rng
from mcbrat3d_tpu.physics.surface import Surface
from mcbrat3d_tpu.scenes.plane_parallel import make_slab
from mcbrat3d_tpu.scenes.step_cloud import make_step_cloud
from mcbrat3d_tpu.sources import illumination
from mcbrat3d_tpu.transport.integrator import KernelConfig, run_batch


def hg_sample_cos(g, u):
    if abs(g) < 1e-6:
        return 2 * u - 1
    s = (1 - g * g) / (1 - g + 2 * g * u)
    return (1 + g * g - s * s) / (2 * g)


def scalar_mc(ext_field, dx, dy, dz, ssa, g, mu0, albedo, n_photons, seed):
    """Reference scalar Woodcock MC on a [nx, ny, nz] extinction grid.

    Returns (R, T, A): domain-mean reflectance, transmittance, absorptance.
    """
    rs = np.random.RandomState(seed)
    nx, ny, nz = ext_field.shape
    lx, ly, lz = nx * dx, ny * dy, nz * dz
    beta_max = ext_field.max()
    n_up = n_down = 0.0
    absorbed = 0.0
    for _ in range(n_photons):
        x, y = rs.rand() * lx, rs.rand() * ly
        z = lz * (1 - 1e-7)
        mu = -abs(mu0)
        st = np.sqrt(1 - mu * mu)
        phi = 0.0
        u = np.array([st * np.cos(phi), st * np.sin(phi), mu])
        w = 1.0
        while True:
            d = -np.log(1 - rs.rand()) / beta_max
            p = np.array([x, y, z]) + u * d
            if p[2] >= lz:
                n_up += w
                break
            if p[2] <= 0.0:
                n_down += w
                w *= albedo
                if w < 1e-12:
                    break
                t = (0.0 - z) / u[2]
                x = (x + u[0] * t) % lx
                y = (y + u[1] * t) % ly
                z = 1e-7 * lz
                smu = np.sqrt(rs.rand())
                sphi = 2 * np.pi * rs.rand()
                sst = np.sqrt(1 - smu * smu)
                u = np.array([sst * np.cos(sphi), sst * np.sin(sphi), smu])
                continue
            x, y, z = p[0] % lx, p[1] % ly, p[2]
            ix = min(int(x / dx), nx - 1)
            iy = min(int(y / dy), ny - 1)
            iz = min(int(z / dz), nz - 1)
            if rs.rand() * beta_max < ext_field[ix, iy, iz]:
                absorbed += w * (1 - ssa)
                w *= ssa
                if w < 1e-12:
                    break
                c = hg_sample_cos(g, rs.rand())
                # rotate
                sphi = 2 * np.pi * rs.rand()
                sint = np.sqrt(max(0.0, 1 - c * c))
                uz = u[2]
                if abs(uz) > 1 - 1e-9:
                    u = np.array([sint * np.cos(sphi),
                                  np.sign(uz) * sint * np.sin(sphi),
                                  np.sign(uz) * c])
                else:
                    den = np.sqrt(1 - uz * uz)
                    nxd = u[0] * c + sint * (u[0] * uz * np.cos(sphi) - u[1] * np.sin(sphi)) / den
                    nyd = u[1] * c + sint * (u[1] * uz * np.cos(sphi) + u[0] * np.sin(sphi)) / den
                    nzd = uz * c - sint * np.cos(sphi) * den
                    u = np.array([nxd, nyd, nzd])
                    u /= np.linalg.norm(u)
    n = float(n_photons)
    return n_up / n, n_down / n, absorbed / n


def kernel_rta(domain, mu0, albedo, cfg, seed=0, n_batches=4):
    """Domain-mean (R, T, A) and per-batch spread from the TPU kernel."""
    rs, ts, as_ = [], [], []
    for b in range(n_batches):
        t = run_batch(domain, Surface.lambertian(albedo),
                      illumination.directional(mu0, 0.0),
                      rng.batch_key(seed, b), cfg)
        n = float(t.n_photons)
        rs.append(float(jnp.sum(t.flux_up)) / n)
        ts.append(float(jnp.sum(t.flux_down)) / n)
        as_.append(float(jnp.sum(t.flux_absorbed)) / n)
    def agg(v):
        v = np.asarray(v)
        return v.mean(), v.std(ddof=1) / np.sqrt(len(v))
    return agg(rs), agg(ts), agg(as_)


@pytest.mark.slow
@pytest.mark.parametrize("ssa,g,mu0,albedo", [
    (1.0, 0.85, 0.5, 0.0),
    (0.9, 0.85, 1.0, 0.0),
    (0.99, 0.0, 0.707, 0.3),
])
def test_slab_matches_scalar_oracle(ssa, g, mu0, albedo):
    tau = 4.0
    nz = 8
    from mcbrat3d_tpu.physics.phase_function import PhaseFunction
    phase = (PhaseFunction.henyey_greenstein(g, 128) if g > 0
             else PhaseFunction.isotropic())
    dom = make_slab(tau=tau, ssa=ssa, phase=phase, nx=2, ny=2, nz=nz,
                    n_cdf_steps=4001)
    ext = np.full((2, 2, nz), tau / 1.0)
    n_oracle = 4000
    r_o, t_o, a_o = scalar_mc(ext, 0.5, 0.5, 1.0 / nz, ssa, g, mu0, albedo,
                              n_oracle, seed=42)
    sig_o = 1.0 / np.sqrt(n_oracle)  # conservative binomial-scale sigma

    cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=4, max_steps=4000,
                       use_russian_roulette=False)
    (r_k, sr), (t_k, st_), (a_k, sa) = kernel_rta(dom, mu0, albedo, cfg)

    for name, o, k, sk in [("R", r_o, r_k, sr), ("T", t_o, t_k, st_),
                           ("A", a_o, a_k, sa)]:
        sig = np.sqrt((sig_o * max(o * (1 - o), 0.05)) ** 2 + sk**2) + 1e-4
        assert abs(o - k) < 4 * np.sqrt(o * (1 - o) / n_oracle + sk**2) + 0.01, (
            f"{name}: oracle={o:.4f} kernel={k:.4f}")


@pytest.mark.slow
def test_step_cloud_matches_scalar_oracle():
    """Step cloud (tau 2/18, HG g=0.85, ssa=0.99) against the scalar tracer."""
    ssa, g, mu0 = 0.99, 0.85, 0.5
    dom = make_step_cloud(ssa=ssa)
    ext = np.empty((32, 1, 32))
    ext[:16] = 2.0 / 250.0
    ext[16:] = 18.0 / 250.0
    n_oracle = 3000
    r_o, t_o, a_o = scalar_mc(ext, 500.0 / 32, 500.0, 250.0 / 32, ssa, g, mu0,
                              0.0, n_oracle, seed=7)
    cfg = KernelConfig(n_lanes=1 << 13, photons_per_lane=4, max_steps=8000,
                       use_russian_roulette=False)
    (r_k, sr), (t_k, st_), (a_k, sa) = kernel_rta(dom, mu0, 0.0, cfg)
    for name, o, k, sk in [("R", r_o, r_k, sr), ("T", t_o, t_k, st_),
                           ("A", a_o, a_k, sa)]:
        tol = 4 * np.sqrt(o * (1 - o) / n_oracle + sk**2) + 0.01
        assert abs(o - k) < tol, f"{name}: oracle={o:.4f} kernel={k:.4f} tol={tol:.4f}"


@pytest.mark.slow
def test_step_cloud_native_oracle_tight():
    """High-statistics cross-validation against the native C++ tracer:
    2M oracle photons vs 1M kernel photons, domain means within combined
    3-sigma and pixel-level upward flux within 4-sigma."""
    from mcbrat3d_tpu.tools.reference_tracer import trace

    ssa, g, mu0 = 0.99, 0.85, 0.5
    ext = np.empty((32, 1, 32))
    ext[:16] = 2.0 / 250.0
    ext[16:] = 18.0 / 250.0
    n_oracle = 2_000_000
    o = trace(ext, ssa, 500.0 / 32, 500.0, 250.0 / 32, g, mu0, 0.0,
              n_oracle, seed=11, want_flux_up=True)

    dom = make_step_cloud(ssa=ssa)
    cfg = KernelConfig(n_lanes=1 << 14, photons_per_lane=16, max_steps=20000)
    t = run_batch(dom, Surface.lambertian(0.0),
                  illumination.directional(mu0, 0.0),
                  rng.batch_key(0, 0), cfg)
    n_k = int(t.n_photons)
    assert int(t.n_bad) == 0

    for name, ov, kv in [
            ("R", o["R"], float(jnp.sum(t.flux_up)) / n_k),
            ("T", o["T"], float(jnp.sum(t.flux_down)) / n_k),
            ("A", o["A"], float(jnp.sum(t.flux_absorbed)) / n_k)]:
        sigma = np.sqrt(ov * (1 - min(ov, 1.0)) * (1 / n_oracle + 1 / n_k))
        assert abs(ov - kv) < 4 * sigma + 3e-4, (name, ov, kv, sigma)

    # pixel-level upward flux (32 columns)
    per_col_o = o["flux_up"][:, 0] / (n_oracle / 32.0)
    per_col_k = np.asarray(t.flux_up)[:, 0] / (n_k / 32.0)
    sig = np.sqrt(per_col_o * (1 / (n_oracle / 32) + 1 / (n_k / 32))) + 1e-4
    bad = np.abs(per_col_o - per_col_k) > 5 * sig + 0.01
    assert not np.any(bad), np.where(bad)
