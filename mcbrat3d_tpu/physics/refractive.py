"""Complex refractive indices of water and ice vs wavelength.

Role-equivalent of the reference's REFWAT/REFICE data routines (reference:
Tools/RefractiveIndex-IceAndWater.f). The built-in tables below are COARSE
approximations assembled from the standard literature compilations (liquid
water after Hale & Querry 1973 / Segelstein 1981; ice after Warren 1984) at
selected wavelengths with log-interpolation of the absorption index --
adequate for framework validation and smoke tables. For production tables,
supply a measured dataset via ``register_refractive_index`` or pass an
explicit index to the Mie tool (namelist ``rindex``).
"""

from __future__ import annotations

import numpy as np

# (lambda_um, n_real, n_imag) -- liquid water, ~295 K
_WATER = np.array([
    (0.30, 1.349, 1.6e-8), (0.40, 1.339, 1.9e-9), (0.50, 1.335, 1.0e-9),
    (0.55, 1.333, 2.0e-9), (0.60, 1.332, 1.1e-8), (0.70, 1.331, 3.4e-8),
    (0.80, 1.329, 1.3e-7), (0.90, 1.328, 4.9e-7), (1.00, 1.327, 2.9e-6),
    (1.20, 1.324, 9.9e-6), (1.40, 1.321, 1.4e-4), (1.60, 1.317, 8.6e-5),
    (1.80, 1.312, 1.2e-4), (2.00, 1.306, 1.1e-3), (2.20, 1.296, 2.9e-4),
    (2.50, 1.261, 1.7e-3), (2.70, 1.188, 1.9e-2), (2.90, 1.201, 2.7e-1),
    (3.00, 1.371, 2.7e-1), (3.20, 1.478, 9.2e-2), (3.50, 1.425, 9.4e-3),
    (4.00, 1.351, 4.6e-3), (4.50, 1.337, 1.3e-2), (5.00, 1.325, 1.2e-2),
    (5.50, 1.298, 1.2e-2), (6.00, 1.265, 1.1e-1), (6.50, 1.332, 3.9e-2),
    (7.00, 1.317, 3.2e-2), (8.00, 1.291, 3.4e-2), (9.00, 1.262, 4.0e-2),
    (10.0, 1.218, 5.1e-2), (11.0, 1.153, 9.7e-2), (12.0, 1.111, 2.0e-1),
    (13.0, 1.146, 3.0e-1), (14.0, 1.210, 3.7e-1), (15.0, 1.270, 4.0e-1),
    (17.0, 1.350, 4.2e-1), (20.0, 1.480, 4.2e-1), (25.0, 1.550, 3.6e-1),
    (30.0, 1.550, 3.3e-1), (40.0, 1.520, 3.9e-1), (50.0, 1.550, 4.5e-1),
])

# (lambda_um, n_real, n_imag) -- ice Ih, ~266 K
_ICE = np.array([
    (0.30, 1.325, 2.0e-9), (0.40, 1.320, 2.7e-9), (0.50, 1.313, 1.9e-9),
    (0.60, 1.309, 5.7e-9), (0.70, 1.306, 2.9e-8), (0.80, 1.304, 1.3e-7),
    (0.90, 1.302, 4.3e-7), (1.00, 1.301, 2.0e-6), (1.20, 1.298, 1.3e-5),
    (1.40, 1.295, 2.2e-4), (1.60, 1.290, 2.4e-4), (1.80, 1.282, 1.1e-4),
    (2.00, 1.274, 1.6e-3), (2.20, 1.263, 2.4e-4), (2.50, 1.228, 8.0e-4),
    (2.70, 1.158, 2.9e-2), (2.90, 1.098, 3.3e-1), (3.08, 1.267, 5.9e-1),
    (3.20, 1.480, 3.0e-1), (3.50, 1.427, 1.4e-2), (4.00, 1.363, 8.0e-3),
    (4.50, 1.340, 1.3e-2), (5.00, 1.315, 1.2e-2), (5.50, 1.296, 2.1e-2),
    (6.00, 1.295, 6.1e-2), (6.50, 1.322, 6.5e-2), (7.00, 1.320, 5.4e-2),
    (8.00, 1.300, 4.0e-2), (9.00, 1.276, 4.3e-2), (10.0, 1.197, 5.1e-2),
    (11.0, 1.098, 2.5e-1), (12.0, 1.268, 4.1e-1), (13.0, 1.421, 3.7e-1),
    (14.0, 1.491, 2.9e-1), (15.0, 1.515, 2.4e-1), (17.0, 1.528, 1.5e-1),
    (20.0, 1.501, 9.1e-2), (25.0, 1.436, 8.7e-2), (30.0, 1.374, 1.6e-1),
    (40.0, 1.315, 3.6e-1), (50.0, 1.557, 5.5e-1),
])

_REGISTRY = {"W": _WATER, "I": _ICE}


def register_refractive_index(key: str, table: np.ndarray) -> None:
    """Register a measured (lambda_um, n, k) table for a particle type."""
    t = np.asarray(table, np.float64)
    if t.ndim != 2 or t.shape[1] != 3:
        raise ValueError("table must be [n, 3]: lambda_um, n_real, n_imag")
    _REGISTRY[key] = t


def refractive_index(particle_type: str, lambda_um) -> np.ndarray:
    """Complex refractive index m = n - i*k at the given wavelength(s).

    The negative imaginary convention matches the reference's usage
    (reference: Tools/MakeMieTable.f95:461 RINDEX = CMPLX(MRE, -MIM)).
    """
    key = particle_type.upper()[:1]
    if key not in _REGISTRY:
        raise ValueError(f"unknown particle type {particle_type!r}; "
                         f"registered: {sorted(_REGISTRY)}")
    t = _REGISTRY[key]
    lam = np.atleast_1d(np.asarray(lambda_um, np.float64))
    if np.any(lam < t[0, 0]) or np.any(lam > t[-1, 0]):
        raise ValueError(f"wavelength outside refractive-index table range "
                         f"[{t[0, 0]}, {t[-1, 0]}] um")
    n = np.interp(lam, t[:, 0], t[:, 1])
    k = np.exp(np.interp(np.log(lam), np.log(t[:, 0]), np.log(t[:, 2])))
    out = n - 1j * k
    return out[0] if np.isscalar(lambda_um) else out
