"""Golden tests for the neural field, rendering math, losses, occ grid."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.models.field import FieldConfig, init_field_params, query_field, query_sigma
from loner_tpu.models.hash_encoding import (
    HashEncodingConfig,
    hash_corner_indices,
    hash_encode,
    init_hash_table,
)
from loner_tpu.models.losses import (
    get_logits_grad,
    get_weights_gt,
    js_divergence_gaussian,
    kl_divergence_gaussian,
)
from loner_tpu.models.occupancy_grid import (
    init_occ_grid,
    interpolate_occ_logits,
    occ_grid_update,
)
from loner_tpu.models.rendering import (
    OccGridRaySampler,
    UniformRaySampler,
    pack_rays,
    raw2outputs,
    render_rays,
    sample_pdf,
)
from loner_tpu.models.sh_encoding import sh_encode


class TestHashEncoding:
    def test_level_structure(self):
        cfg = HashEncodingConfig(n_levels=16, log2_hashmap_size=18, base_resolution=16)
        sizes = cfg.level_table_sizes()
        # Coarse levels dense: level 0 has (16+1)^3 entries.
        assert sizes[0] == 17 ** 3
        # Fine levels capped at 2^18.
        assert sizes[-1] == 2 ** 18
        assert cfg.total_table_size == sizes.sum()

    def test_weights_sum_to_one(self):
        cfg = HashEncodingConfig(n_levels=4)
        pos = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 3)), jnp.float32)
        _, w = hash_corner_indices(pos, cfg)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)

    def test_custom_vjp_matches_autodiff_oracle(self):
        """The hand-written training VJP (hash_encode_train, the default
        gradient path for hash-sigma configs) must match jax.grad of the
        plain hash_encode — any drift silently corrupts every mapping
        gradient rather than crashing."""
        from loner_tpu.models.hash_encoding import hash_encode_train

        cfg = HashEncodingConfig(
            n_levels=4, log2_hashmap_size=10, base_resolution=4,
            per_level_scale=1.7,
        )
        table = init_hash_table(jax.random.key(2), cfg) * 10.0
        rng = np.random.default_rng(5)
        # Include out-of-range points (clip path) and near-vertex points.
        pos = np.concatenate([
            rng.uniform(-0.1, 1.1, (48, 3)),
            np.array([[0.25, 0.5, 0.75]]),
        ]).astype(np.float32)
        pos = jnp.asarray(pos)
        encode = hash_encode_train(
            compute_dtype=jnp.float32, residual_dtype=jnp.float32
        )
        cot = jnp.asarray(
            rng.normal(size=(pos.shape[0], cfg.output_dim)), jnp.float32
        )

        def loss_vjp(t, p):
            return jnp.sum(encode(t, p, cfg) * cot)

        def loss_oracle(t, p):
            return jnp.sum(hash_encode(t, p, cfg) * cot)

        out_v = encode(table, pos, cfg)
        out_o = hash_encode(table, pos, cfg)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_o), atol=1e-5)
        gt_v, gp_v = jax.grad(loss_vjp, argnums=(0, 1))(table, pos)
        gt_o, gp_o = jax.grad(loss_oracle, argnums=(0, 1))(table, pos)
        np.testing.assert_allclose(np.asarray(gt_v), np.asarray(gt_o), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gp_v), np.asarray(gp_o), atol=2e-4)

    def test_dense_level_vertex_exact(self):
        # At a dense-grid vertex the encoding equals the stored feature.
        cfg = HashEncodingConfig(n_levels=1, base_resolution=4, log2_hashmap_size=18)
        table = init_hash_table(jax.random.key(0), cfg)
        # Vertex (1, 2, 3) of the 5^3 dense grid -> pos01 = vertex / 4.
        pos = jnp.asarray([[1 / 4, 2 / 4, 3 / 4]], jnp.float32)
        out = hash_encode(table, pos, cfg)
        expected = table[1 + 2 * 5 + 3 * 25]
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(expected), atol=1e-6)

    def test_linear_along_axis(self):
        cfg = HashEncodingConfig(n_levels=1, base_resolution=2, log2_hashmap_size=18)
        table = init_hash_table(jax.random.key(1), cfg)
        # Trilerp is linear between adjacent vertices: midpoint = average.
        p0 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        p1 = jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32)
        pm = jnp.asarray([[0.25, 0.0, 0.0]], jnp.float32)
        f0, f1, fm = (hash_encode(table, p, cfg) for p in (p0, p1, pm))
        np.testing.assert_allclose(np.asarray(fm), np.asarray(0.5 * (f0 + f1)), atol=1e-6)

    def test_boundary_clamps(self):
        cfg = HashEncodingConfig(n_levels=2)
        table = init_hash_table(jax.random.key(2), cfg)
        pos = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.5, -0.5, 0.5]], jnp.float32)
        out = hash_encode(table, pos, cfg)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_gradients_flow_to_table(self):
        cfg = HashEncodingConfig(n_levels=2, base_resolution=4)
        table = init_hash_table(jax.random.key(3), cfg)
        pos = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, (16, 3)), jnp.float32)
        g = jax.grad(lambda t: hash_encode(t, pos, cfg).sum())(table)
        assert float(jnp.abs(g).sum()) > 0


class TestFourierEncodeVJP:
    """The custom-VJP Fourier encode must match the plain-autodiff oracle.

    fourier_encode_vjp saves the (possibly bf16) output as its only
    residual and runs the backward in that dtype; in f32 it must be
    exact, in bf16 within rounding of the oracle."""

    def _grads(self, fn, pos, cfg):
        def loss(p):
            out = fn(p) if cfg is None else fn(p, cfg)
            return jnp.sum(jnp.sin(out.astype(jnp.float32) * 0.7))

        return jax.grad(loss)(pos)

    @pytest.mark.parametrize("include_input", [True, False])
    def test_f32_exact_vs_autodiff(self, include_input):
        from loner_tpu.models.field import (
            FourierConfig,
            fourier_encode,
            fourier_encode_vjp,
        )

        cfg = FourierConfig(n_freqs=32, include_input=include_input)
        pos = jnp.asarray(
            np.random.default_rng(3).uniform(size=(64, 3)), jnp.float32
        )
        out_ref = fourier_encode(pos, cfg)
        out_vjp = fourier_encode_vjp(pos, cfg, jnp.float32)
        np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_vjp))
        g_ref = self._grads(lambda p, c: fourier_encode(p, c), pos, cfg)
        g_vjp = self._grads(
            lambda p, c: fourier_encode_vjp(p, c, jnp.float32), pos, cfg
        )
        np.testing.assert_allclose(
            np.asarray(g_ref), np.asarray(g_vjp), rtol=1e-6, atol=1e-6
        )

    def test_bf16_grads_near_oracle(self):
        from loner_tpu.models.field import (
            FourierConfig,
            fourier_encode,
            fourier_encode_vjp,
        )

        cfg = FourierConfig(n_freqs=64, include_input=True)
        pos = jnp.asarray(
            np.random.default_rng(7).uniform(size=(256, 3)), jnp.float32
        )
        out = fourier_encode_vjp(pos, cfg, jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        g_ref = self._grads(lambda p, c: fourier_encode(p, c), pos, cfg)
        g_vjp = self._grads(
            lambda p, c: fourier_encode_vjp(p, c, jnp.bfloat16), pos, cfg
        )
        # bf16 has ~3 decimal digits; judge error against the gradient's
        # scale (element-wise relative error is meaningless where the
        # oracle itself is near zero).
        g_ref = np.asarray(g_ref)
        err = np.abs(np.asarray(g_vjp) - g_ref)
        assert float(err.max()) / float(np.abs(g_ref).max()) < 1e-2

    def test_field_uses_vjp_by_default(self):
        from loner_tpu.models.field import FourierConfig

        assert FourierConfig().encode_impl == "vjp"


class TestMlpApplyVJP:
    """The custom-VJP MLP (bf16 cotangent streams) must match the
    plain-autodiff oracle: bit-identical in f32, within bf16 rounding of
    the f32 oracle otherwise — for weights, biases, AND the input
    cotangent that feeds the encode backward."""

    def _params(self, rng, dims, bias):
        from loner_tpu.models.field import MLPConfig, _init_mlp

        cfg = MLPConfig(
            n_neurons=dims[1], n_hidden_layers=len(dims) - 2, output_dim=dims[-1]
        )
        return _init_mlp(jax.random.key(rng), dims[0], cfg, bias=bias)

    def _grads(self, apply_fn, params, x, dtype):
        def loss(p, xx):
            out = apply_fn(p, xx, dtype)
            return jnp.sum(jnp.tanh(out.astype(jnp.float32)))

        return jax.grad(loss, argnums=(0, 1))(params, x)

    @pytest.mark.parametrize("bias", [False, True])
    def test_f32_exact_vs_autodiff(self, bias):
        from loner_tpu.models.field import _apply_mlp, mlp_apply_vjp

        params = self._params(11, [99, 64, 64, 1], bias)
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(128, 99)), jnp.float32
        )
        np.testing.assert_array_equal(
            np.asarray(_apply_mlp(params, x, jnp.float32)),
            np.asarray(mlp_apply_vjp(params, x, jnp.float32)),
        )
        gp_ref, gx_ref = self._grads(_apply_mlp, params, x, jnp.float32)
        gp_vjp, gx_vjp = self._grads(mlp_apply_vjp, params, x, jnp.float32)
        np.testing.assert_array_equal(np.asarray(gx_ref), np.asarray(gx_vjp))
        for k in gp_ref:
            np.testing.assert_array_equal(
                np.asarray(gp_ref[k]), np.asarray(gp_vjp[k])
            )

    def test_bf16_grads_near_bf16_autodiff(self):
        """In bf16 the right oracle is AUTODIFF-bf16 (the shipped
        pre-round-5 behavior): both share the bf16 FORWARD's activation
        rounding (measured ~0.1 of grad scale on gx vs the f32 oracle,
        identically for both), so the VJP must sit within bf16 rounding of
        autodiff-bf16 — the backward's own contribution."""
        from loner_tpu.models.field import _apply_mlp, mlp_apply_vjp

        params = self._params(13, [99, 256, 256, 1], bias=True)
        x = jnp.asarray(
            np.random.default_rng(9).normal(size=(512, 99)), jnp.float32
        )
        out = mlp_apply_vjp(params, x, jnp.bfloat16)
        assert out.dtype == jnp.float32  # last layer emits f32
        gp_ref, gx_ref = self._grads(_apply_mlp, params, x, jnp.bfloat16)
        gp_vjp, gx_vjp = self._grads(mlp_apply_vjp, params, x, jnp.bfloat16)

        def rel(a, b):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            return float(np.abs(a - b).max()) / max(float(np.abs(a).max()), 1e-12)

        assert rel(gx_ref, gx_vjp) < 1e-2
        for k in gp_ref:
            # Biases legitimately differ a little more: the VJP's db is
            # f32-ACCUMULATED (closer to the f32 oracle than autodiff-bf16's
            # own reduction — test below pins that), so vs the bf16-autodiff
            # oracle it carries both backends' reduction rounding.
            assert rel(gp_ref[k], gp_vjp[k]) < 3e-2, k

    def test_bf16_matches_bf16_autodiff_class(self):
        """vjp-bf16 must be no further from the f32 oracle than
        autodiff-bf16 is (the shipped pre-round-5 behavior), within 2x."""
        from loner_tpu.models.field import _apply_mlp, mlp_apply_vjp

        params = self._params(17, [99, 256, 256, 1], bias=True)
        x = jnp.asarray(
            np.random.default_rng(21).normal(size=(512, 99)), jnp.float32
        )
        gp_f32, _ = self._grads(_apply_mlp, params, x, jnp.float32)
        gp_ad16, _ = self._grads(_apply_mlp, params, x, jnp.bfloat16)
        gp_vjp16, _ = self._grads(mlp_apply_vjp, params, x, jnp.bfloat16)
        for k in gp_f32:
            ref = np.asarray(gp_f32[k], np.float32)
            e_ad = np.abs(np.asarray(gp_ad16[k], np.float32) - ref).max()
            e_vjp = np.abs(np.asarray(gp_vjp16[k], np.float32) - ref).max()
            assert e_vjp <= 2.0 * e_ad + 1e-6, (k, e_vjp, e_ad)


class TestSHEncoding:
    def test_constant_term(self):
        dirs = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_encode((dirs + 1) / 2, degree=4)
        assert out.shape == (8, 16)
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.28209479, atol=1e-6)

    def test_degree1_linear(self):
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        out = sh_encode((d + 1) / 2, degree=2)
        # Y_1^0 ~ z with coefficient 0.4886.
        assert out[0, 2] == pytest.approx(0.48860252, abs=1e-6)


class TestSamplePdf:
    def test_deterministic_uniform_weights(self):
        bins = jnp.asarray(np.linspace(0, 1, 9)[None].repeat(2, 0), jnp.float32)
        weights = jnp.ones((2, 8), jnp.float32)
        s = sample_pdf(jax.random.key(0), bins, weights, 16, det=True)
        s = np.asarray(s)
        assert s.shape == (2, 16)
        assert np.all(np.diff(s, axis=-1) >= -1e-6)
        assert s.min() >= 0 and s.max() <= 1

    def test_concentrated_weights(self):
        bins = jnp.asarray(np.linspace(0, 1, 11)[None], jnp.float32)
        weights = np.full((1, 10), 1e-8, np.float32)
        weights[0, 5] = 1.0  # all mass in bin [0.5, 0.6]
        s = np.asarray(sample_pdf(jax.random.key(1), bins, jnp.asarray(weights), 64))
        frac_in_bin = np.mean((s >= 0.5) & (s <= 0.6))
        assert frac_in_bin > 0.95

    def test_matches_searchsorted_oracle(self):
        """The matmul-based interval lookup (gathers serialize on TPU) must
        be bit-equivalent to the searchsorted + take_along_axis oracle
        (reference rendering_tcnn.py:18-67)."""

        def oracle(key, bins, weights, n_importance, det=False, eps=1e-5):
            n_rays, n_bins = weights.shape
            weights = weights + eps
            pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
            cdf = jnp.cumsum(pdf, axis=-1)
            cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
            if det:
                u = jnp.broadcast_to(
                    jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype),
                    (n_rays, n_importance),
                )
            else:
                u = jax.random.uniform(key, (n_rays, n_importance), dtype=cdf.dtype)
            inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1)
            below = jnp.maximum(inds - 1, 0)
            above = jnp.minimum(inds, n_bins)
            cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
            cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
            bins_b = jnp.take_along_axis(bins, below, axis=-1)
            bins_a = jnp.take_along_axis(bins, above, axis=-1)
            denom = jnp.where(cdf_a - cdf_b < eps, 1.0, cdf_a - cdf_b)
            return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)

        rng = np.random.default_rng(0)
        for trial in range(4):
            b, m, q = (
                int(rng.integers(3, 32)),
                int(rng.integers(8, 128)),
                int(rng.integers(4, 128)),
            )
            bins = jnp.asarray(np.sort(rng.uniform(0, 1, (b, m)), axis=-1), jnp.float32)
            w = jnp.asarray(rng.uniform(0, 1, (b, m - 1)) ** 2, jnp.float32)
            for det in (True, False):
                key = jax.random.key(trial)
                expect = oracle(key, bins, w, q, det=det)
                got = sample_pdf(key, bins, w, q, det=det)
                np.testing.assert_array_equal(np.asarray(expect), np.asarray(got))


class TestRaw2Outputs:
    def test_opaque_wall(self):
        # One huge sigma at sample 2 -> all weight there, depth = z_2.
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]], jnp.float32)
        raw = jnp.asarray([[[0.0], [0.0], [1e8], [0.0]]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        out = raw2outputs(raw, z, d, sigma_only=True, far=jnp.asarray([[10.0]]))
        assert out["depth"][0] == pytest.approx(3.0, abs=1e-4)
        assert out["opacity"][0] == pytest.approx(1.0, abs=1e-4)

    def test_empty_space_far_depth(self):
        # Zero sigma everywhere -> weights 0, depth = far (residual bin).
        z = jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32)
        raw = jnp.zeros((1, 3, 1), jnp.float32)
        out = raw2outputs(
            raw, z, jnp.asarray([[1.0, 0.0, 0.0]]), sigma_only=True, far=jnp.asarray([[9.0]])
        )
        assert out["depth"][0] == pytest.approx(9.0, abs=1e-5)
        assert out["opacity"][0] == pytest.approx(0.0, abs=1e-5)

    def test_hand_computed_alpha(self):
        # sigma=1 at both samples, delta=1 and inf:
        # a1 = 1-e^-1; T2 = (1-a1); a2 = 1 (delta inf)
        z = jnp.asarray([[1.0, 2.0]], jnp.float32)
        raw = jnp.ones((1, 2, 1), jnp.float32)
        out = raw2outputs(raw, z, jnp.asarray([[1.0, 0.0, 0.0]]), sigma_only=True)
        a1 = 1 - np.exp(-1.0)
        w = np.asarray(out["weights"][0])
        assert w[0] == pytest.approx(a1, abs=1e-5)
        assert w[1] == pytest.approx(1 - a1, rel=1e-4)

    def test_variance_zero_for_delta(self):
        z = jnp.asarray([[1.0, 2.0, 3.0, 4.0]], jnp.float32)
        raw = jnp.asarray([[[0.0], [1e8], [0.0], [0.0]]], jnp.float32)
        out = raw2outputs(
            raw, z, jnp.asarray([[1.0, 0.0, 0.0]]), sigma_only=True,
            far=jnp.asarray([[10.0]]), ret_var=True,
        )
        assert out["variance"][0] == pytest.approx(0.0, abs=1e-3)

    def test_direction_norm_scales_deltas(self):
        z = jnp.asarray([[1.0, 2.0]], jnp.float32)
        raw = jnp.ones((1, 2, 1), jnp.float32)
        out1 = raw2outputs(raw, z, jnp.asarray([[1.0, 0, 0]]), sigma_only=True)
        out2 = raw2outputs(raw, z, jnp.asarray([[2.0, 0, 0]]), sigma_only=True)
        # doubled |d| doubles delta: a = 1 - e^-2
        assert out2["weights"][0, 0] == pytest.approx(1 - np.exp(-2.0), abs=1e-5)
        assert out1["weights"][0, 0] == pytest.approx(1 - np.exp(-1.0), abs=1e-5)


class TestLosses:
    def test_weights_gt_normalized_and_supported(self):
        z = jnp.asarray(np.linspace(0, 10, 100)[None].repeat(4, 0), jnp.float32)
        gt = jnp.asarray([[3.0], [5.0], [7.0], [9.0]], jnp.float32)
        w = np.asarray(get_weights_gt(z, gt, eps=1.0))
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-3)
        zs = np.asarray(z)
        outside = (zs < np.asarray(gt) - 1.0) | (zs > np.asarray(gt) + 1.0)
        assert np.all(w[outside] == 0)
        # Peak at the sample nearest to gt depth.
        for i in range(4):
            nearest = np.argmin(np.abs(zs[i] - float(gt[i, 0])))
            assert abs(int(np.argmax(w[i])) - int(nearest)) <= 1

    def test_weights_gt_matches_reference_formula(self):
        # Independent recomputation of the reference's truncated-Gaussian
        # target (losses.py:29-51) in numpy.
        from scipy.stats import norm as scipy_norm

        z = np.linspace(0, 10, 50, dtype=np.float32)[None]
        gt = np.asarray([[4.0]], np.float32)
        eps = 0.8
        sigma = eps / 3
        raw = scipy_norm.pdf((z - gt) / sigma) / sigma / (
            scipy_norm.cdf(3) - scipy_norm.cdf(-3)
        )
        raw[(z < gt - eps) | (z > gt + eps)] = 0
        expected = raw / (raw.sum(1, keepdims=True) + 1e-6)
        ours = np.asarray(get_weights_gt(jnp.asarray(z), jnp.asarray(gt), eps))
        np.testing.assert_allclose(ours, expected, atol=1e-4)

    def test_per_ray_eps(self):
        z = jnp.asarray(np.linspace(0, 10, 100)[None].repeat(2, 0), jnp.float32)
        gt = jnp.asarray([[5.0], [5.0]], jnp.float32)
        eps = jnp.asarray([[0.5], [2.0]], jnp.float32)
        w = np.asarray(get_weights_gt(z, gt, eps))
        support = (w > 0).sum(1)
        assert support[1] > support[0] * 2

    def test_logits_grad_bands(self):
        z = jnp.asarray([[0.0, 5.0, 9.5, 10.0, 10.5, 13.0]], jnp.float32)
        d = jnp.asarray([[10.0]], jnp.float32)
        g = np.asarray(get_logits_grad(z, d, eps=2.0))
        np.testing.assert_allclose(g[0], [0.25, 0.25, -2.5, -2.5, -2.5, 0.0], atol=1e-6)

    def test_kl_identical_zero(self):
        kl = kl_divergence_gaussian(jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(0.5))
        assert float(kl) == pytest.approx(0.0, abs=1e-7)

    def test_js_symmetric_positive(self):
        m1, s1 = jnp.asarray(1.0), jnp.asarray(0.3)
        m2, s2 = jnp.asarray(2.0), jnp.asarray(0.6)
        a = float(js_divergence_gaussian(m1, s1, m2, s2))
        b = float(js_divergence_gaussian(m2, s2, m1, s1))
        assert a == pytest.approx(b, rel=1e-6)
        assert a > 0


class TestOccupancyGrid:
    def test_matches_torch_grid_sample(self):
        import torch

        rng = np.random.default_rng(0)
        grid = rng.normal(size=(16, 16, 16)).astype(np.float32)
        pts = rng.uniform(-0.95, 0.95, (64, 3)).astype(np.float32)

        ours = np.asarray(interpolate_occ_logits(jnp.asarray(grid), jnp.asarray(pts)))

        t_grid = torch.from_numpy(grid)[None, None]  # (1, 1, D, H, W)
        t_pts = torch.from_numpy(pts)[None, None, None]  # (1, 1, 1, N, 3)
        theirs = torch.nn.functional.grid_sample(
            t_grid, t_pts, mode="bilinear", align_corners=False
        ).reshape(-1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_update_moves_logits(self):
        grid = init_occ_grid(16)
        pts = jnp.zeros((1, 3), jnp.float32)
        g = jnp.asarray([-1.0], jnp.float32)  # push logits up (grad descent)
        new = occ_grid_update(grid, pts, g, lr=0.1)
        val = float(interpolate_occ_logits(new, pts)[0])
        assert val > 0


class TestRenderRays:
    def _make_rays(self, n=8):
        rng = np.random.default_rng(0)
        o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        near = np.full((n,), 0.01, np.float32)
        far = np.full((n,), 0.8, np.float32)
        return pack_rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(near), jnp.asarray(far))

    def test_uniform_sampler_shapes(self):
        cfg = FieldConfig(
            pos_encoding_sigma=HashEncodingConfig(n_levels=4),
            pos_encoding_intensity=HashEncodingConfig(n_levels=4, log2_hashmap_size=16),
        )
        params = init_field_params(jax.random.key(0), cfg)
        rays = self._make_rays(8)
        out = render_rays(
            jax.random.key(1), rays, params, cfg, UniformRaySampler(),
            n_samples=32, perturb=1.0, sigma_only=True, ret_var=True,
        )
        assert out["depth"].shape == (8,)
        assert out["weights"].shape == (8, 32)
        assert out["z_vals"].shape == (8, 32)
        assert out["variance"].shape == (8,)
        assert np.all(np.isfinite(np.asarray(out["depth"])))

    def test_occ_sampler_sorted_in_range(self):
        cfg = FieldConfig(pos_encoding_sigma=HashEncodingConfig(n_levels=4))
        rays = self._make_rays(4)
        occ = init_occ_grid(16)
        z = OccGridRaySampler().get_samples(jax.random.key(2), rays, 32, 1.0, occ)
        z = np.asarray(z)
        assert z.shape == (4, 32)
        assert np.all(np.diff(z, axis=-1) >= 0)
        assert z.min() >= 0.009 and z.max() <= 0.81

    def test_color_mode(self):
        cfg = FieldConfig(
            pos_encoding_sigma=HashEncodingConfig(n_levels=2),
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=16),
        )
        params = init_field_params(jax.random.key(3), cfg)
        rays = self._make_rays(4)
        out = render_rays(
            jax.random.key(4), rays, params, cfg, UniformRaySampler(),
            n_samples=16, sigma_only=False,
        )
        assert out["rgb"].shape == (4, 3)
        rgb = np.asarray(out["rgb"])
        assert rgb.min() >= 0 and rgb.max() <= 1

    def test_detach_sigma_blocks_gradient(self):
        cfg = FieldConfig(
            pos_encoding_sigma=HashEncodingConfig(n_levels=2),
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=16),
        )
        params = init_field_params(jax.random.key(5), cfg)
        pos = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (8, 3)), jnp.float32)
        dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)

        def loss_detached(p):
            return query_field(p, pos, dirs, cfg, sigma_only=False, detach_sigma=True).sum()

        g = jax.grad(loss_detached)(params)
        assert float(jnp.abs(g["sigma"]["table"]).sum()) == 0
        assert float(jnp.abs(g["intensity"]["table"]).sum()) > 0

        def loss_joint(p):
            return query_field(p, pos, dirs, cfg, sigma_only=False, detach_sigma=False).sum()

        g2 = jax.grad(loss_joint)(params)
        assert float(jnp.abs(g2["sigma"]["table"]).sum()) > 0

    def test_sigma_query_jits(self):
        cfg = FieldConfig(pos_encoding_sigma=HashEncodingConfig(n_levels=4))
        params = init_field_params(jax.random.key(6), cfg)
        f = jax.jit(lambda p, x: query_sigma(p, x, cfg))
        out = f(params, jnp.zeros((16, 3), jnp.float32))
        assert out.shape == (16, 1)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        from loner_tpu.ops.marching import marching_tetrahedra

        n = 24
        coords = np.stack(
            np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), axis=-1
        ).astype(np.float32)
        center, radius = (n - 1) / 2.0, 7.0
        field = radius - np.linalg.norm(coords - center, axis=-1)  # >0 inside
        verts, faces = marching_tetrahedra(field, 0.0)
        assert len(verts) > 100 and len(faces) > 100
        # All vertices lie near the sphere of the given radius.
        d = np.linalg.norm(verts - center, axis=-1)
        np.testing.assert_allclose(d, radius, atol=0.35)
        assert faces.max() < len(verts)

    def test_empty_field(self):
        from loner_tpu.ops.marching import marching_tetrahedra

        verts, faces = marching_tetrahedra(np.zeros((8, 8, 8), np.float32), 0.5)
        assert len(verts) == 0 and len(faces) == 0


class TestFourierIntensity:
    """encoding_intensity: fourier — the TPU flagship option for the
    intensity head (the hash table's gradient pays a sort/segment-sum
    pass per camera iteration; the fourier branch is pure matmuls)."""

    def _cfg(self):
        from loner_tpu.models.field import FourierConfig

        return FieldConfig(
            encoding_sigma="fourier",
            encoding_intensity="fourier",
            fourier_intensity=FourierConfig(n_freqs=16, scale=4.0, seed=4321),
            density_activation="softplus",
            sigma_mlp_bias=True,
        )

    def test_no_table_and_output_shape(self):
        cfg = self._cfg()
        params = init_field_params(jax.random.key(0), cfg)
        assert "table" not in params["intensity"]
        pos = jax.random.uniform(jax.random.key(1), (32, 3), minval=-1, maxval=1)
        dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
        out = query_field(params, pos, dirs, cfg)
        assert out.shape == (32, 4)
        assert (out[:, :3] >= 0).all() and (out[:, :3] <= 1).all()  # sigmoid

    def test_gradients_flow_to_intensity_mlp(self):
        cfg = self._cfg()
        params = init_field_params(jax.random.key(0), cfg)
        pos = jax.random.uniform(jax.random.key(1), (32, 3), minval=-1, maxval=1)
        dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
        g = jax.grad(lambda p: query_field(p, pos, dirs, cfg)[:, :3].sum())(params)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["intensity"]))
        assert total > 0

    def test_from_settings_parses_fourier_intensity(self):
        cfg = FieldConfig.from_settings(
            {
                "encoding_sigma": "fourier",
                "encoding_intensity": "fourier",
                "fourier_intensity": {"n_freqs": 24, "scale": 5.0},
                "sigma_network": {"n_neurons": 64, "n_hidden_layers": 1},
                "intensity_network": {"n_neurons": 64, "n_hidden_layers": 2},
                "pos_encoding_intensity": {},
            }
        )
        assert cfg.encoding_intensity == "fourier"
        assert cfg.fourier_intensity.n_freqs == 24
        # Distinct default seed: the intensity features must not reuse the
        # sigma head's projection matrix.
        assert cfg.fourier_intensity.seed == 4321

    def test_unknown_encoding_intensity_raises(self):
        with pytest.raises(ValueError, match="encoding_intensity"):
            FieldConfig.from_settings(
                {
                    "encoding_intensity": "forier",
                    "sigma_network": {"n_neurons": 64, "n_hidden_layers": 1},
                    "pos_encoding_intensity": {},
                }
            )


class TestConfigValidation:
    """Unknown config values must fail loudly, not silently take a default
    path (the freeze_rgb_mlp parse-and-ignore trap from VERDICT r2)."""

    def test_unknown_encoding_sigma_raises(self):
        import pytest

        with pytest.raises(ValueError, match="encoding_sigma"):
            FieldConfig.from_settings(
                {
                    "encoding_sigma": "forier",  # typo
                    "sigma_network": {"n_neurons": 64, "n_hidden_layers": 1},
                    "pos_encoding_intensity": {},
                }
            )

    def test_unknown_model_type_raises(self):
        import os

        import pytest

        from loner_tpu.common.settings import Settings
        from loner_tpu.common.signals import Signal
        from loner_tpu.mapping.mapper import Mapper

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        seq = Settings.load_from_file(
            os.path.join(repo, "cfg/synthetic/box_room_tiny.yaml")
        )
        settings = Settings.load_from_file(
            os.path.join(repo, "cfg/synthetic", seq["baseline"])
        )
        settings.augment(seq.get("changes"))
        settings.mapper.optimizer.model_config.model.model_type = "nerf_coupled"
        with pytest.raises(ValueError, match="model_type"):
            Mapper(settings.mapper, Signal(), Signal(), world_cube=None)

    def test_unknown_fourier_encode_impl_raises(self):
        import pytest

        from loner_tpu.models.field import FourierConfig

        with pytest.raises(ValueError, match="encode_impl"):
            FourierConfig.from_settings({"encode_impl": "vjp_bf16"})
