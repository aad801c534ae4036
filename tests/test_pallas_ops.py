"""Pallas kernels vs their XLA reference implementations (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.models.rendering import raw2outputs
from loner_tpu.ops.pallas.composite import composite_rays


def test_composite_matches_raw2outputs():
    rng = np.random.default_rng(0)
    b, s = 256, 128
    z = np.sort(rng.uniform(0.05, 0.9, (b, s)).astype(np.float32), axis=1)
    sigma = rng.normal(2.0, 3.0, (b, s)).astype(np.float32)
    far = np.full((b,), 0.95, np.float32)
    dnorm = np.ones((b,), np.float32)

    depth, opacity, var, weights = composite_rays(
        jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(far), jnp.asarray(dnorm),
        interpret=True,
    )

    ref = raw2outputs(
        jnp.asarray(sigma)[..., None],
        jnp.asarray(z),
        jnp.asarray(np.stack([dnorm, np.zeros(b), np.zeros(b)], 1)),
        sigma_only=True,
        far=jnp.asarray(far)[:, None],
        ret_var=True,
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(opacity), np.asarray(ref["opacity"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(ref["weights"]), rtol=5e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref["variance"]), rtol=1e-3, atol=2e-4)


def test_composite_empty_and_opaque():
    b, s = 256, 128
    z = np.tile(np.linspace(0.1, 0.8, s, dtype=np.float32), (b, 1))
    sigma = np.zeros((b, s), np.float32)
    sigma[: b // 2, s // 2] = 1e8  # first half: hard wall mid-ray
    far = np.full((b,), 0.9, np.float32)
    depth, opacity, _, _ = composite_rays(
        jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(far), jnp.ones(b),
        interpret=True,
    )
    depth, opacity = np.asarray(depth), np.asarray(opacity)
    np.testing.assert_allclose(depth[: b // 2], z[0, s // 2], atol=1e-3)
    np.testing.assert_allclose(opacity[: b // 2], 1.0, atol=1e-4)
    np.testing.assert_allclose(depth[b // 2 :], 0.9, atol=1e-4)  # far residual
    np.testing.assert_allclose(opacity[b // 2 :], 0.0, atol=1e-5)


def test_fourier_mlp_fused_fwd_and_grads_match_xla():
    """Fused RFF+MLP kernel (fwd + custom VJP) vs the pure-XLA field path,
    including weight/bias gradients and the position gradients that carry
    pose twists."""
    from loner_tpu.models.field import (
        FieldConfig,
        FourierConfig,
        MLPConfig,
        fourier_bmat,
        init_field_params,
        query_sigma,
    )
    from loner_tpu.models.hash_encoding import HashEncodingConfig
    from loner_tpu.ops.pallas.fourier_mlp import fourier_sigma_fused

    cfg = FieldConfig(
        encoding_sigma="fourier",
        fourier_sigma=FourierConfig(n_freqs=16, scale=3.0),
        sigma_mlp=MLPConfig(n_neurons=64, n_hidden_layers=2, output_dim=1),
        sigma_mlp_bias=True,
        compute_dtype=jnp.float32,
        sigma_kernel="xla",  # oracle path for query_sigma
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )
    params = init_field_params(jax.random.key(0), cfg)
    mlp = params["sigma"]["mlp"]
    bmat = fourier_bmat(cfg.fourier_sigma)
    n = 300  # non-multiple of TILE_N exercises padding
    pts = jax.random.uniform(jax.random.key(1), (n, 3), minval=-0.9, maxval=0.9)
    pts01 = (pts + 1.0) * 0.5

    ref = query_sigma(params, pts, cfg)
    fused = fourier_sigma_fused(
        mlp, pts01, bmat, compute_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-4)

    def loss_ref(m, p01):
        pp = {"sigma": {"mlp": m}, "intensity": params["intensity"]}
        return (query_sigma(pp, p01 * 2.0 - 1.0, cfg) ** 2).sum()

    def loss_fused(m, p01):
        return (
            fourier_sigma_fused(
                m, p01, bmat, compute_dtype=jnp.float32, interpret=True
            )
            ** 2
        ).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(mlp, pts01)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(mlp, pts01)
    for k in g_ref[0]:
        scale = max(float(jnp.abs(g_ref[0][k]).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(g_fused[0][k]) / scale,
            np.asarray(g_ref[0][k]) / scale,
            atol=5e-5,
            err_msg=k,
        )
    scale = max(float(jnp.abs(g_ref[1]).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(g_fused[1]) / scale, np.asarray(g_ref[1]) / scale, atol=5e-5
    )


def test_composite_softplus_matches_raw2outputs():
    """The softplus density activation (fourier-flagship path) in the
    fused compositing kernel."""
    rng = np.random.default_rng(3)
    b, s = 256, 128
    z = np.sort(rng.uniform(0.05, 0.9, (b, s)).astype(np.float32), axis=1)
    sigma = rng.normal(0.0, 3.0, (b, s)).astype(np.float32)
    far = np.full((b,), 0.95, np.float32)
    dnorm = np.ones((b,), np.float32)

    depth, opacity, var, weights = composite_rays(
        jnp.asarray(z), jnp.asarray(sigma), jnp.asarray(far), jnp.asarray(dnorm),
        interpret=True, softplus=True,
    )
    ref = raw2outputs(
        jnp.asarray(sigma)[..., None],
        jnp.asarray(z),
        jnp.asarray(np.stack([dnorm, np.zeros(b), np.zeros(b)], 1)),
        sigma_only=True,
        far=jnp.asarray(far)[:, None],
        ret_var=True,
        softplus=True,
    )
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref["depth"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(opacity), np.asarray(ref["opacity"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(ref["weights"]), rtol=5e-3, atol=2e-4)


def test_compositor_knob_plumbing_and_cpu_fallback():
    """model.render.compositor reaches the chunk renderer, and
    compositor="pallas" on a non-TPU backend silently takes the XLA path
    (Mosaic lowering exists only on TPU)."""
    from loner_tpu.analysis._render_impl import configured_compositor
    from loner_tpu.common.settings import Settings
    from loner_tpu.models.field import FieldConfig, FourierConfig, MLPConfig, init_field_params
    from loner_tpu.models.hash_encoding import HashEncodingConfig
    from loner_tpu.models.rendering import UniformRaySampler, pack_rays, render_rays

    s = Settings(
        {"mapper": {"optimizer": {"model_config": {"model": {"render": {"compositor": "pallas"}}}}}}
    )
    assert configured_compositor(s) == "pallas"
    assert configured_compositor(Settings({"mapper": {}})) == "xla"

    cfg = FieldConfig(
        encoding_sigma="fourier",
        fourier_sigma=FourierConfig(n_freqs=8, scale=2.0),
        sigma_mlp=MLPConfig(n_neurons=32, n_hidden_layers=1, output_dim=1),
        density_activation="softplus", sigma_mlp_bias=True,
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )
    params = init_field_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    b = 256  # TILE_B-aligned
    o = jnp.asarray(rng.uniform(-0.2, 0.2, (b, 3)), jnp.float32)
    d = rng.normal(size=(b, 3)); d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = pack_rays(o, jnp.asarray(d, jnp.float32), jnp.full((b,), 0.05), jnp.full((b,), 0.9))
    out_p = render_rays(None, rays, params, cfg, UniformRaySampler(),
                        n_samples=32, perturb=0.0, sigma_only=True, ret_var=True,
                        point_chunk=0, compositor="pallas")
    out_x = render_rays(None, rays, params, cfg, UniformRaySampler(),
                        n_samples=32, perturb=0.0, sigma_only=True, ret_var=True,
                        point_chunk=0, compositor="xla")
    # On CPU both are the XLA compositor: identical outputs.
    np.testing.assert_array_equal(np.asarray(out_p["depth"]), np.asarray(out_x["depth"]))
