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
from functools import partial
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
class FourierConfig:
    """Gaussian random-Fourier-feature positional encoding (flagship
    TPU-native path).

    On this TPU toolchain, per-sample random table access (the hash-grid
    gather and especially its backward scatter-add) lowers to serialized
    loops ~2-3 orders of magnitude off the HBM/MXU roofline, while dense
    matmuls run at full speed (measured: 16.8M-element scatter-add =
    1.05 s, a 1.2-TFLOP fused MLP fwd+bwd at 2.1M points = 64 ms). The
    TPU-first scene representation is therefore an MXU-dense field:
    fixed Gaussian Fourier features (Tancik et al. 2020) feeding a wider
    MLP, replacing tiny-cuda-nn's HashGrid+tiny-MLP (reference
    src/models/nerf_tcnn.py:35-52) at equal capability. The feature
    matrix is derived from a fixed seed (not trained, not checkpointed).
    """

    n_freqs: int = 64
    scale: float = 6.0
    include_input: bool = True
    seed: int = 1234
    # "vjp": custom-VJP encode whose saved residuals are the bf16 output
    # itself (no separate f32 sin/cos streams + converts — the training
    # step is HBM-bandwidth-bound and the f32 residuals were ~15% of its
    # bytes; docs/PERFORMANCE.md round 3). "xla": plain autodiff
    # (f32 residuals — the correctness oracle).
    encode_impl: str = "vjp"

    @property
    def output_dim(self) -> int:
        return 2 * self.n_freqs + (3 if self.include_input else 0)

    @staticmethod
    def from_settings(cfg: dict) -> "FourierConfig":
        encode_impl = str(cfg.get("encode_impl", "vjp"))
        if encode_impl not in ("vjp", "xla"):
            raise ValueError(
                f"fourier_sigma.encode_impl must be 'vjp' or 'xla', got "
                f"{encode_impl!r}"
            )
        return FourierConfig(
            n_freqs=int(cfg.get("n_freqs", 64)),
            scale=float(cfg.get("scale", 6.0)),
            include_input=bool(cfg.get("include_input", True)),
            seed=int(cfg.get("seed", 1234)),
            encode_impl=encode_impl,
        )


def fourier_bmat(cfg: FourierConfig) -> jax.Array:
    """The fixed Gaussian projection matrix (3, F); a deterministic
    function of cfg.seed, constant-folded by XLA."""
    return (
        jax.random.normal(jax.random.key(cfg.seed), (3, cfg.n_freqs), jnp.float32)
        * cfg.scale
        * (2.0 * jnp.pi)
    )


def fourier_encode(pos01: jax.Array, cfg: FourierConfig) -> jax.Array:
    """(N, 3) in [0, 1] -> (N, 2F [+3]) features (f32, plain autodiff)."""
    proj = jnp.dot(
        pos01, fourier_bmat(cfg), precision=jax.lax.Precision.HIGHEST
    )
    feats = [jnp.sin(proj), jnp.cos(proj)]
    if cfg.include_input:
        feats.append(pos01)
    return jnp.concatenate(feats, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fourier_encode_vjp(pos01: jax.Array, cfg: FourierConfig, dtype) -> jax.Array:
    """fourier_encode computing sin/cos in f32 (phase precision) but
    emitting — and saving for backward — only ``dtype`` features.

    With plain autodiff the f32 sin/cos stay live as residuals and the
    MLP consumes separate bf16 converts; at 2M-point batches those f32
    streams are pure HBM traffic on a bandwidth-bound step. Here the
    residual IS the output buffer (aliased, zero extra bytes) and the
    backward runs in ``dtype``:  dproj = g_sin*cos - g_cos*sin,
    dpos = dproj @ B^T (+ g_input), accumulated in f32."""
    out, _ = _fourier_encode_vjp_fwd(pos01, cfg, dtype)
    return out


def _fourier_encode_vjp_fwd(pos01, cfg: FourierConfig, dtype):
    proj = jnp.dot(
        pos01, fourier_bmat(cfg), precision=jax.lax.Precision.HIGHEST
    )
    feats = [jnp.sin(proj).astype(dtype), jnp.cos(proj).astype(dtype)]
    if cfg.include_input:
        feats.append(pos01.astype(dtype))
    out = jnp.concatenate(feats, axis=-1)
    return out, out


def _fourier_encode_vjp_bwd(cfg: FourierConfig, dtype, out, g):
    f = cfg.n_freqs
    sin_d, cos_d = out[:, :f], out[:, f : 2 * f]
    g = g.astype(dtype)
    dproj = g[:, :f] * cos_d - g[:, f : 2 * f] * sin_d
    dpos = jnp.dot(
        dproj,
        fourier_bmat(cfg).T.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    if cfg.include_input:
        dpos = dpos + g[:, 2 * f :].astype(jnp.float32)
    return (dpos.astype(jnp.float32),)


fourier_encode_vjp.defvjp(_fourier_encode_vjp_fwd, _fourier_encode_vjp_bwd)


@dataclass(frozen=True)
class FieldConfig:
    num_colors: int = 3
    enable_view_dependence: bool = True
    sh_degree: int = 4
    # "hash" = Instant-NGP hash grid (reference-parity path);
    # "fourier" = Gaussian RFF + wide MLP (TPU-native flagship path).
    encoding_sigma: str = "hash"
    pos_encoding_sigma: HashEncodingConfig = dc_field(default_factory=HashEncodingConfig)
    fourier_sigma: FourierConfig = dc_field(default_factory=FourierConfig)
    # The intensity head's positional encoding: "hash" is the
    # reference-parity default (HashGrid 2^19, nerf_tcnn.py:40-52);
    # "fourier" is the TPU flagship option — training the intensity head
    # with a hash table pays the table-gradient sort/segment-sum pass
    # every camera iteration, while the fourier branch is pure MXU
    # matmuls like the sigma flagship.
    encoding_intensity: str = "hash"
    pos_encoding_intensity: HashEncodingConfig = dc_field(
        default_factory=lambda: HashEncodingConfig(log2_hashmap_size=19)
    )
    fourier_intensity: FourierConfig = dc_field(
        default_factory=lambda: FourierConfig(seed=4321)
    )
    sigma_mlp: MLPConfig = dc_field(default_factory=MLPConfig)
    intensity_mlp: MLPConfig = dc_field(
        default_factory=lambda: MLPConfig(n_hidden_layers=4, output_dim=3)
    )
    # Density activation inside alpha compositing. "relu" matches the
    # reference (rendering_tcnn.py:96); the global-support fourier field
    # needs "softplus" — with ReLU a transiently all-negative sigma field
    # has zero gradient everywhere and training dies (hash features are
    # local, so the reference never hits this).
    density_activation: str = "relu"
    # Bias terms in the sigma MLP (tcnn's FullyFusedMLP is bias-free; the
    # fourier MLP benefits from them).
    sigma_mlp_bias: bool = False
    compute_dtype: Any = jnp.float32
    # MLP backward implementation. "vjp" (default): hand-written VJP whose
    # hidden cotangent streams run in compute_dtype (bf16 on TPU) with f32
    # dW/db accumulation — the HBM-bound training step's last identified
    # f32 streams (docs/PERFORMANCE.md round 5). "xla": plain autodiff
    # (the correctness oracle; bit-identical to "vjp" when compute_dtype
    # is float32).
    mlp_grad: str = "vjp"
    # Fused Pallas kernel for the fourier sigma head (encode + MLP fwd/bwd
    # VMEM-resident, ops/pallas/fourier_mlp.py). "xla" (the default) is
    # the pure-XLA path, "pallas" forces the kernel (requires
    # include_input=True; interpret mode off-TPU is debug-only), "auto"
    # uses the kernel whenever on TPU. Isolated A/B at the 2.1M-point
    # training batch favors the kernel (fwd+bwd 41.3 vs 56.4 ms,
    # docs/PERFORMANCE.md), but measured inside the FULL training step XLA
    # wins (66.4 vs 73.3 ms/it) — its fusion with the surrounding
    # sampler/compositing ops outweighs the isolated gap — so the default
    # is the documented/benchmarked XLA path and the kernel is opt-in.
    sigma_kernel: str = "xla"

    @property
    def sigma_input_dim(self) -> int:
        if self.encoding_sigma == "fourier":
            return self.fourier_sigma.output_dim
        return self.pos_encoding_sigma.output_dim

    @property
    def intensity_pos_dim(self) -> int:
        if self.encoding_intensity == "fourier":
            return self.fourier_intensity.output_dim
        return self.pos_encoding_intensity.output_dim

    @staticmethod
    def from_settings(nerf_cfg: dict, num_colors: int = 3, compute_dtype=jnp.float32) -> "FieldConfig":
        """Build from the reference-format nerf config yaml
        (cfg/nerf_config/default_nerf_hash.yaml; the TPU-native variant
        adds ``encoding_sigma: fourier`` + a ``fourier_sigma`` section)."""
        encoding = str(nerf_cfg.get("encoding_sigma", "hash"))
        if encoding not in ("hash", "fourier"):
            raise ValueError(
                f"unknown encoding_sigma {encoding!r}: expected 'hash' "
                "(reference-parity HashGrid) or 'fourier' (TPU-native flagship)"
            )
        encoding_intensity = str(nerf_cfg.get("encoding_intensity", "hash"))
        if encoding_intensity not in ("hash", "fourier"):
            raise ValueError(
                f"unknown encoding_intensity {encoding_intensity!r}: "
                "expected 'hash' or 'fourier'"
            )
        sigma_net = nerf_cfg["sigma_network"]
        if "compute_dtype" in nerf_cfg:
            compute_dtype = (
                jnp.bfloat16 if "bf" in str(nerf_cfg["compute_dtype"]) else jnp.float32
            )
        return FieldConfig(
            num_colors=num_colors,
            enable_view_dependence=bool(nerf_cfg.get("enable_view_dependence", True)),
            sh_degree=int(nerf_cfg.get("dir_encoding_intensity", {}).get("degree", 4)),
            encoding_sigma=encoding,
            pos_encoding_sigma=HashEncodingConfig.from_settings(
                nerf_cfg.get("pos_encoding_sigma", {})
            ),
            fourier_sigma=FourierConfig.from_settings(
                nerf_cfg.get("fourier_sigma", {})
            ),
            encoding_intensity=encoding_intensity,
            pos_encoding_intensity=HashEncodingConfig.from_settings(
                nerf_cfg["pos_encoding_intensity"]
            ),
            fourier_intensity=FourierConfig.from_settings(
                {"seed": 4321, **nerf_cfg.get("fourier_intensity", {})}
            ),
            sigma_mlp=MLPConfig(
                n_neurons=int(sigma_net["n_neurons"]),
                n_hidden_layers=int(sigma_net["n_hidden_layers"]),
                output_dim=1,
            ),
            intensity_mlp=MLPConfig(
                n_neurons=int(nerf_cfg["intensity_network"]["n_neurons"]),
                n_hidden_layers=int(nerf_cfg["intensity_network"]["n_hidden_layers"]),
                output_dim=num_colors,
            ),
            density_activation=str(
                nerf_cfg.get(
                    "density_activation",
                    "softplus" if encoding == "fourier" else "relu",
                )
            ),
            sigma_mlp_bias=bool(
                nerf_cfg.get("sigma_mlp_bias", encoding == "fourier")
            ),
            compute_dtype=compute_dtype,
            mlp_grad=str(nerf_cfg.get("mlp_grad", "vjp")),
            sigma_kernel=str(nerf_cfg.get("sigma_kernel", "xla")),
        )


def _init_mlp(
    key: jax.Array, in_dim: int, cfg: MLPConfig, bias: bool = False
) -> Dict[str, jax.Array]:
    """MLP weights, He-uniform (matches tcnn's default init); optional
    zero-initialized biases."""
    dims = [in_dim] + [cfg.n_neurons] * cfg.n_hidden_layers + [cfg.output_dim]
    params = {}
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        bound = jnp.sqrt(6.0 / d_in)
        params[f"w{i}"] = jax.random.uniform(
            sub, (d_in, d_out), minval=-bound, maxval=bound, dtype=jnp.float32
        )
        if bias:
            params[f"b{i}"] = jnp.zeros((d_out,), jnp.float32)
    return params


def _apply_mlp(params: Dict[str, jax.Array], x: jax.Array, dtype) -> jax.Array:
    """ReLU MLP; matmuls in ``dtype``. MXU accumulation is f32 internally
    either way; hidden activations are WRITTEN in ``dtype`` (halving the
    dominant HBM traffic at multi-million-point batches when bfloat16),
    and only the final layer materializes f32."""
    n = sum(1 for k in params if k.startswith("w"))
    h = x.astype(dtype)
    for i in range(n):
        w = params[f"w{i}"].astype(dtype)
        last = i == n - 1
        h = jnp.dot(h, w, preferred_element_type=jnp.float32 if last else dtype)
        if f"b{i}" in params:
            h = h + params[f"b{i}"].astype(h.dtype)
        if not last:
            h = jax.nn.relu(h)
    return h  # f32 (from preferred_element_type)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def mlp_apply_vjp(params: Dict[str, jax.Array], x: jax.Array, dtype) -> jax.Array:
    """``_apply_mlp`` with a hand-written backward whose hidden-activation
    COTANGENT streams run in ``dtype`` (bf16 on TPU) instead of autodiff's
    f32 converts; weight/bias gradients accumulate in f32 on the MXU.

    Why: the training step is HBM-bandwidth-bound (docs/PERFORMANCE.md,
    round 3 — every remaining top op sits at 650-760 GB/s) and at
    2.1M-point batches the backward's per-layer (N, 256) cotangents are
    the largest remaining f32 streams. This is the MLP-side twin of
    ``fourier_encode_vjp``: residuals are exactly the forward's own
    ``dtype`` activation buffers (no extra saves), the transpose matmuls
    emit ``dtype``, and only the reductions (dW = hᵀg, db = Σg) use f32
    accumulation. In f32 the path is bit-identical to autodiff (tested);
    in bf16 grads match the f32 oracle to the same tolerance class as the
    encode VJP (tests/test_models.py::TestMlpApplyVJP).
    """
    out, _ = _mlp_apply_vjp_fwd(params, x, dtype)
    return out


def _mlp_apply_vjp_fwd(params, x, dtype):
    n = sum(1 for k in params if k.startswith("w"))
    h = x.astype(dtype)
    acts = [h]  # input to each layer, in ``dtype``
    for i in range(n):
        w = params[f"w{i}"].astype(dtype)
        last = i == n - 1
        h = jnp.dot(h, w, preferred_element_type=jnp.float32 if last else dtype)
        if f"b{i}" in params:
            h = h + params[f"b{i}"].astype(h.dtype)
        if not last:
            h = jax.nn.relu(h)
            acts.append(h)
    # Saving ``params`` is free (live anyway); acts[0] aliases the caller's
    # feature buffer when it already arrives in ``dtype`` (the vjp encode's
    # output does). The zero-size array only carries x's dtype (residual
    # leaves must be JAX types).
    return h, (params, tuple(acts), jnp.zeros((0,), x.dtype))


def _mlp_apply_vjp_bwd(dtype, res, g):
    params, acts, x_proto = res
    x_dtype = x_proto.dtype
    n = sum(1 for k in params if k.startswith("w"))
    dparams = {}
    # g arrives f32 (the forward's last layer emits f32); the cast to
    # ``dtype`` happens at the narrow output (out_dim wide) — cheap.
    gz = g.astype(dtype)  # cotangent of layer i's pre-activation output
    gh = gz
    for i in range(n - 1, -1, -1):
        h_in = acts[i]
        # dW = hᵀg expressed as a dot_general contracting the batch dim
        # (no materialized transpose; matches autodiff's transpose rule
        # bit-for-bit in f32), f32 accumulation.
        dparams[f"w{i}"] = jax.lax.dot_general(
            h_in, gz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if f"b{i}" in params:
            dparams[f"b{i}"] = jnp.sum(gz, axis=0, dtype=jnp.float32)
        gh = jax.lax.dot_general(
            gz, params[f"w{i}"].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
        )
        if i > 0:
            # acts[i] is layer i-1's post-ReLU output: mask is (h > 0)
            # (matches jax.nn.relu's zero subgradient at 0).
            gz = jnp.where(h_in > 0, gh, jnp.zeros((), dtype))
    return dparams, gh.astype(x_dtype)


mlp_apply_vjp.defvjp(_mlp_apply_vjp_fwd, _mlp_apply_vjp_bwd)


def init_field_params(key: jax.Array, cfg: FieldConfig) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma_in = cfg.sigma_input_dim
    intensity_in = cfg.intensity_pos_dim + (
        cfg.sh_degree ** 2 if cfg.enable_view_dependence else 0
    )
    sigma_params: Dict[str, Any] = {
        "mlp": _init_mlp(k2, sigma_in, cfg.sigma_mlp, bias=cfg.sigma_mlp_bias)
    }
    if cfg.encoding_sigma != "fourier":
        sigma_params["table"] = init_hash_table(k1, cfg.pos_encoding_sigma)
    intensity_params: Dict[str, Any] = {
        "mlp": _init_mlp(k4, intensity_in, cfg.intensity_mlp)
    }
    if cfg.encoding_intensity != "fourier":
        intensity_params["table"] = init_hash_table(k3, cfg.pos_encoding_intensity)
    return {
        "sigma": sigma_params,
        "intensity": intensity_params,
    }


def _encode_sigma(sigma_params, pos01, cfg: FieldConfig, encode_fn=None) -> jax.Array:
    if cfg.encoding_sigma == "fourier":
        if cfg.fourier_sigma.encode_impl == "vjp":
            return fourier_encode_vjp(
                pos01, cfg.fourier_sigma, cfg.compute_dtype
            )
        return fourier_encode(pos01, cfg.fourier_sigma)
    encode = encode_fn or hash_encode
    return encode(sigma_params["table"], pos01, cfg.pos_encoding_sigma)


def _use_fused_fourier(cfg: FieldConfig) -> bool:
    if cfg.encoding_sigma != "fourier" or not cfg.fourier_sigma.include_input:
        return False
    if cfg.sigma_kernel == "pallas":
        return True
    return cfg.sigma_kernel == "auto" and jax.default_backend() == "tpu"


def _fused_sigma(sigma_params, pos01, cfg: FieldConfig) -> jax.Array:
    from loner_tpu.ops.pallas.fourier_mlp import fourier_sigma_fused

    return fourier_sigma_fused(
        sigma_params["mlp"],
        pos01,
        fourier_bmat(cfg.fourier_sigma),
        compute_dtype=cfg.compute_dtype,
        # Off-TPU there is no Mosaic lowering; interpret mode keeps
        # sigma_kernel: pallas runnable (slow — debugging only).
        interpret=jax.default_backend() != "tpu",
    )


def _mlp(params_mlp, x, cfg: FieldConfig) -> jax.Array:
    if cfg.mlp_grad == "vjp":
        return mlp_apply_vjp(params_mlp, x, cfg.compute_dtype)
    return _apply_mlp(params_mlp, x, cfg.compute_dtype)


def query_sigma(
    params: Dict[str, Any],
    pos: jax.Array,
    cfg: FieldConfig,
    encode_fn=None,
) -> jax.Array:
    """Density head. pos: (N, 3) in [-1, 1]. Returns (N, 1) raw sigma.

    ``encode_fn`` lets callers swap in a custom hash-encode implementation
    (e.g. the custom-VJP training path); default is the pure-XLA gather.
    """
    pos01 = (pos + 1.0) * 0.5
    if _use_fused_fourier(cfg):
        return _fused_sigma(params["sigma"], pos01, cfg)
    feats = _encode_sigma(params["sigma"], pos01, cfg, encode_fn)
    return _mlp(params["sigma"]["mlp"], feats, cfg)


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
    pos01 = (pos + 1.0) * 0.5
    if _use_fused_fourier(cfg):
        sigma = _fused_sigma(sigma_params, pos01, cfg)
    else:
        feats = _encode_sigma(sigma_params, pos01, cfg, encode_fn)
        sigma = _mlp(sigma_params["mlp"], feats, cfg)
    finfo = jnp.finfo(cfg.compute_dtype)
    sigma = jnp.nan_to_num(sigma, posinf=finfo.max, neginf=finfo.min)

    if sigma_only:
        return sigma

    dirs01 = (dirs + 1.0) * 0.5
    if cfg.encoding_intensity == "fourier":
        if cfg.fourier_intensity.encode_impl == "vjp":
            h_x = fourier_encode_vjp(
                pos01, cfg.fourier_intensity, cfg.compute_dtype
            )
        else:
            h_x = fourier_encode(pos01, cfg.fourier_intensity)
    else:
        h_x = (encode_fn or hash_encode)(
            params["intensity"]["table"], pos01, cfg.pos_encoding_intensity
        )
    if cfg.enable_view_dependence:
        h_d = sh_encode(dirs01, cfg.sh_degree)
        h_x = jnp.concatenate([h_x, h_d.astype(h_x.dtype)], axis=-1)
    color = jax.nn.sigmoid(_mlp(params["intensity"]["mlp"], h_x, cfg))
    return jnp.concatenate([color, sigma], axis=-1)
