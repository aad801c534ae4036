"""Loss building blocks: truncated-Gaussian LOS targets, JS divergence,
occupancy log-odds gradients.

TPU-native counterpart of the reference's loss helpers
(src/models/losses.py:17-62) and the Gaussian-divergence closed forms in
the optimizer (src/mapping/optimizer.py:611-626). These feed LONER's
signature JS dynamic-margin line-of-sight loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INV_SQRT_2PI = 0.3989422804014327
_INV_SQRT_2 = 0.7071067811865476


def _norm_pdf(x):
    return _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT_2))


def get_weights_gt(
    sampled_depth: jax.Array,
    gt_depth: jax.Array,
    eps,
    norm: bool = True,
) -> jax.Array:
    """Target weight distribution: truncated Gaussian N(d_gt, (eps/3)^2)
    clipped to [d_gt - eps, d_gt + eps], row-normalized
    (reference losses.py:29-51).

    sampled_depth: (N, S); gt_depth: (N, 1); eps: scalar or (N, 1).
    """
    eps = jnp.asarray(eps, dtype=sampled_depth.dtype)
    sigma = eps / 3.0
    # CDF mass inside the clip window is constant: cdf(3) - cdf(-3).
    z = (sampled_depth - gt_depth) / sigma
    mass = _norm_cdf(jnp.asarray(3.0)) - _norm_cdf(jnp.asarray(-3.0))
    w = _norm_pdf(z) / sigma / mass
    inside = (sampled_depth >= gt_depth - eps) & (sampled_depth <= gt_depth + eps)
    w = jnp.where(inside, w, 0.0)
    if norm:
        w = w / (w.sum(axis=1, keepdims=True) + 1e-6)
    return w


def get_logits_grad(
    z_vals: jax.Array,
    depth: jax.Array,
    eps: float = 2.0,
    l_free: float = 0.25,
    l_occ: float = 2.5,
) -> jax.Array:
    """Occupancy log-odds pseudo-gradient (reference losses.py:54-62):
    +l_free well before the return, -l_occ in the +-eps band around it.
    Heaviside convention matches torch.heaviside(x, 0): H(0) = 0.
    """
    x = z_vals - depth

    def heav(v):
        return jnp.where(v > 0, 1.0, 0.0)

    return l_free * heav(-x - eps) - l_occ * heav(x + eps) * heav(eps - x)


def kl_divergence_gaussian(mean1, std1, mean2, std2):
    """KL(N1 || N2) closed form (reference optimizer.py:614-621)."""
    var1, var2 = std1 * std1, std2 * std2
    return jnp.log(std2 / std1) + (var1 + (mean1 - mean2) ** 2) / (2.0 * var2) - 0.5


def js_divergence_gaussian(mean1, std1, mean2, std2):
    """The reference's (approximate) Gaussian JS divergence
    (optimizer.py:623-626): both distributions against the moment-average
    N(0.5(m1+m2), 0.5*sqrt(s1^2+s2^2))."""
    mean_m = 0.5 * (mean1 + mean2)
    std_m = 0.5 * jnp.sqrt(std1 * std1 + std2 * std2)
    return 0.5 * kl_divergence_gaussian(mean1, std1, mean_m, std_m) + 0.5 * (
        kl_divergence_gaussian(mean2, std2, mean_m, std_m)
    )


def img_to_mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse_to_psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(10.0)
