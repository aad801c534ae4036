"""Real spherical-harmonics direction encoding (degree <= 4).

TPU-native replacement for tcnn's SphericalHarmonics encoding (used by the
reference's intensity head, src/models/nerf_tcnn.py:43 with degree 4 from
cfg/nerf_config/default_nerf_hash.yaml). Input directions arrive in
[0, 1]^3 (tcnn convention, reference nerf_tcnn.py:83 maps [-1,1] -> [0,1])
and are mapped back to [-1, 1] internally. Polynomials match the
hard-coded expansion used by tcnn/instant-ngp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sh_encode(dirs01: jax.Array, degree: int = 4) -> jax.Array:
    """(N, 3) directions in [0,1] -> (N, degree^2) SH basis values."""
    assert 1 <= degree <= 4, "degree must be in [1, 4]"
    d = dirs01 * 2.0 - 1.0
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z

    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (x2 - y2),
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
