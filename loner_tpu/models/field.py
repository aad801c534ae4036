"""DecoupledField: the neural scene representation.

TPU-native replacement for the reference's ``DecoupledNeRF``
(src/models/nerf_tcnn.py:19-95), which wraps two independent tiny-cuda-nn
networks:

  sigma:     HashGrid(16x2 @ 2^18, base 16) -> MLP(64, 1 hidden) -> 1
  intensity: HashGrid(16x2 @ 2^19) (+) SH(4) -> MLP(64, 4 hidden) -> C,
             sigmoid output

Here the field is a pure function of a parameter pytree — freezing a head
is a mask in the optimizer, not a ``requires_grad`` flip; ``detach_sigma``
is a ``stop_gradient``. MLPs are bias-free (tcnn's FullyFusedMLP has no
bias terms), He-uniform initialized. Inputs arrive in [-1, 1]^3 (world
cube) and are mapped to [0, 1] like the reference (nerf_tcnn.py:63,83).

Compute dtype is a config knob: tables/weights are stored float32 for
Adam stability, and the MLP matmuls run in the requested dtype (bfloat16
on TPU keeps the MXU fed; the trilerp weighted-sums stay f32).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from loner_tpu.models.hash_encoding import (
    HashEncodingConfig,
    hash_encode,
    init_hash_table,
)
from loner_tpu.models.sh_encoding import sh_encode


@dataclass(frozen=True)
class MLPConfig:
    n_neurons: int = 64
    n_hidden_layers: int = 1
    output_dim: int = 1


@dataclass(frozen=True)
class FieldConfig:
    num_colors: int = 3
    enable_view_dependence: bool = True
    sh_degree: int = 4
    pos_encoding_sigma: HashEncodingConfig = dc_field(default_factory=HashEncodingConfig)
    pos_encoding_intensity: HashEncodingConfig = dc_field(
        default_factory=lambda: HashEncodingConfig(log2_hashmap_size=19)
    )
    sigma_mlp: MLPConfig = dc_field(default_factory=MLPConfig)
    intensity_mlp: MLPConfig = dc_field(
        default_factory=lambda: MLPConfig(n_hidden_layers=4, output_dim=3)
    )
    compute_dtype: Any = jnp.float32

    @staticmethod
    def from_settings(nerf_cfg: dict, num_colors: int = 3, compute_dtype=jnp.float32) -> "FieldConfig":
        """Build from the reference-format nerf config yaml
        (cfg/nerf_config/default_nerf_hash.yaml)."""
        return FieldConfig(
            num_colors=num_colors,
            enable_view_dependence=bool(nerf_cfg.get("enable_view_dependence", True)),
            sh_degree=int(nerf_cfg.get("dir_encoding_intensity", {}).get("degree", 4)),
            pos_encoding_sigma=HashEncodingConfig.from_settings(
                nerf_cfg["pos_encoding_sigma"]
            ),
            pos_encoding_intensity=HashEncodingConfig.from_settings(
                nerf_cfg["pos_encoding_intensity"]
            ),
            sigma_mlp=MLPConfig(
                n_neurons=int(nerf_cfg["sigma_network"]["n_neurons"]),
                n_hidden_layers=int(nerf_cfg["sigma_network"]["n_hidden_layers"]),
                output_dim=1,
            ),
            intensity_mlp=MLPConfig(
                n_neurons=int(nerf_cfg["intensity_network"]["n_neurons"]),
                n_hidden_layers=int(nerf_cfg["intensity_network"]["n_hidden_layers"]),
                output_dim=num_colors,
            ),
            compute_dtype=compute_dtype,
        )


def _init_mlp(key: jax.Array, in_dim: int, cfg: MLPConfig) -> Dict[str, jax.Array]:
    """Bias-free MLP weights, He-uniform (matches tcnn's default init)."""
    dims = [in_dim] + [cfg.n_neurons] * cfg.n_hidden_layers + [cfg.output_dim]
    params = {}
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        bound = jnp.sqrt(6.0 / d_in)
        params[f"w{i}"] = jax.random.uniform(
            sub, (d_in, d_out), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return params


def _apply_mlp(params: Dict[str, jax.Array], x: jax.Array, dtype) -> jax.Array:
    """ReLU MLP, bias-free; matmuls in ``dtype``, f32 accumulation."""
    n = len(params)
    h = x.astype(dtype)
    for i in range(n):
        w = params[f"w{i}"].astype(dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jax.nn.relu(h).astype(dtype)
    return h  # f32 (from preferred_element_type)


def init_field_params(key: jax.Array, cfg: FieldConfig) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma_in = cfg.pos_encoding_sigma.output_dim
    intensity_in = cfg.pos_encoding_intensity.output_dim + (
        cfg.sh_degree ** 2 if cfg.enable_view_dependence else 0
    )
    return {
        "sigma": {
            "table": init_hash_table(k1, cfg.pos_encoding_sigma),
            "mlp": _init_mlp(k2, sigma_in, cfg.sigma_mlp),
        },
        "intensity": {
            "table": init_hash_table(k3, cfg.pos_encoding_intensity),
            "mlp": _init_mlp(k4, intensity_in, cfg.intensity_mlp),
        },
    }


def query_sigma(
    params: Dict[str, Any],
    pos: jax.Array,
    cfg: FieldConfig,
    encode_fn=None,
) -> jax.Array:
    """Density head. pos: (N, 3) in [-1, 1]. Returns (N, 1) raw sigma.

    ``encode_fn`` lets callers swap in the Pallas fused kernel; default is
    the pure-XLA gather path.
    """
    encode = encode_fn or hash_encode
    pos01 = (pos + 1.0) * 0.5
    feats = encode(params["sigma"]["table"], pos01, cfg.pos_encoding_sigma)
    return _apply_mlp(params["sigma"]["mlp"], feats, cfg.compute_dtype)


def query_field(
    params: Dict[str, Any],
    pos: jax.Array,
    dirs: Optional[jax.Array],
    cfg: FieldConfig,
    sigma_only: bool = False,
    detach_sigma: bool = True,
    encode_fn=None,
) -> jax.Array:
    """Full field query (reference nerf_tcnn.py:59-95).

    pos: (N, 3) in [-1, 1]; dirs: (N, 3) in [-1, 1] (unit view directions).
    Returns (N, 1) raw sigma if sigma_only else (N, C+1) [color.., sigma]
    with sigmoid applied to color. NaN/inf sigmas are clamped like the
    reference's warn-and-clip path (nerf_tcnn.py:74-78).
    """
    sigma_params = params["sigma"]
    if detach_sigma and not sigma_only:
        sigma_params = jax.lax.stop_gradient(sigma_params)
    encode = encode_fn or hash_encode
    pos01 = (pos + 1.0) * 0.5
    feats = encode(sigma_params["table"], pos01, cfg.pos_encoding_sigma)
    sigma = _apply_mlp(sigma_params["mlp"], feats, cfg.compute_dtype)
    finfo = jnp.finfo(cfg.compute_dtype)
    sigma = jnp.nan_to_num(sigma, posinf=finfo.max, neginf=finfo.min)

    if sigma_only:
        return sigma

    dirs01 = (dirs + 1.0) * 0.5
    h_x = encode(
        params["intensity"]["table"], pos01, cfg.pos_encoding_intensity
    )
    if cfg.enable_view_dependence:
        h_d = sh_encode(dirs01, cfg.sh_degree)
        h_x = jnp.concatenate([h_x, h_d.astype(h_x.dtype)], axis=-1)
    color = jax.nn.sigmoid(_apply_mlp(params["intensity"]["mlp"], h_x, cfg.compute_dtype))
    return jnp.concatenate([color, sigma], axis=-1)
