"""Jitted chunk renderer shared by the offline analysis tools.

Split out of render_utils so the jit cache can key on the loaded model
object: without jit, the test-time sampler's (rays, samples, ctrl-bins)
interval lookup materializes every intermediate eagerly (tens of GB at
16384 x 2048-sample chunks) and each op is a separate device dispatch.
One compiled program per (model, shape) instead.
"""
from __future__ import annotations

from typing import Optional

import jax

from loner_tpu.models.rendering import make_sampler, render_rays


def get_chunk_renderer(
    model,
    n_samples: int,
    ret_var: bool,
    use_occ: bool,
    sigma_only: bool = True,
    ret_peak: bool = False,
):
    """A jitted (rays, field_params, occ) -> outputs function, cached on
    the LoadedModel so repeated scans/chunks reuse one executable.
    ``sigma_only=False`` additionally composites the intensity head's
    color along each ray (reference renderer.py intensity images).
    ``ret_peak`` adds per-ray peak-depth consistency |z@argmax(w) -
    depth| (reference renderer.py:197-203) — a cheap confidence proxy
    computed on device so the (N, S) weights never leave HBM."""
    key = (n_samples, ret_var, use_occ, sigma_only, ret_peak)
    cache = model.render_cache
    if key in cache:
        return cache[key]

    n_ctrl = trained_n_ctrl(model.settings)
    sampler = make_sampler(model.occ_grid if use_occ else None, n_ctrl=n_ctrl)
    field_cfg = model.field_cfg
    compositor = configured_compositor(model.settings)

    @jax.jit
    def render_chunk(rays, field_params, occ):
        out = render_rays(
            None,
            rays,
            field_params,
            field_cfg,
            sampler,
            n_samples=n_samples,
            perturb=0.0,
            sigma_only=sigma_only,
            occ_grid=occ,
            ret_var=ret_var,
            point_chunk=0,
            compositor=compositor,
        )
        if ret_peak:
            import jax.numpy as jnp

            idx = jnp.argmax(out["weights"], axis=-1)
            z_peak = jnp.take_along_axis(
                out["z_vals"], idx[:, None], axis=-1
            )[:, 0]
            out["peak_depth_consistency"] = jnp.abs(z_peak - out["depth"])
        return out

    cache[key] = render_chunk
    return render_chunk


def configured_compositor(settings) -> str:
    """Test-render compositor choice
    (model_config.model.render.compositor: xla | pallas). The Pallas
    fused-compositing kernel (ops/pallas/composite.py) applies to the
    sigma-only inference case; "xla" is the default."""
    try:
        render = settings.mapper.optimizer.model_config.model.render
        return str(dict(render).get("compositor", "xla"))
    except Exception:
        return "xla"


def trained_n_ctrl(settings) -> Optional[int]:
    """The proposal control resolution the model was trained with
    (mapper.optimizer.model_config.model.occ_model.prop_n_ctrl)."""
    try:
        occ = settings.mapper.optimizer.model_config.model.occ_model
        val = int(dict(occ).get("prop_n_ctrl", 0))
        return val or None
    except Exception:
        return None
