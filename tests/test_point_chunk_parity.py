"""Chunked point evaluation must be semantically a no-op.

``point_chunk`` blocks the field evaluation over fixed-size lax.map
chunks (models/rendering.py::render_rays) so large batches bound their
HBM live set — the HASH field at reference scale does not even compile
unchunked (34 GB forward-gather intermediate; docs/PERFORMANCE.md
"Hash-path disposition (round 4)"). This pins that the chunked program
computes the same training step as the unchunked one, for both the
fourier flagship and the hash parity field, so chunking can never bend
the result. CPU f32 (conftest), deterministic same-seed comparison.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.mapping.optimizer import OptimizerConfig, PhaseSettings, make_phase_runner
from loner_tpu.mapping.rays import build_window_buffers
from loner_tpu.models.field import FieldConfig, FourierConfig, MLPConfig, init_field_params
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.occupancy_grid import init_occ_grid


W, N_RAYS, N_SAMPLES = 3, 64, 32  # 6144 points/iter -> 3 chunks at 2048


def _field_cfg(kind):
    if kind == "fourier":
        return FieldConfig(
            encoding_sigma="fourier",
            fourier_sigma=FourierConfig(n_freqs=8, scale=4.0),
            sigma_mlp=MLPConfig(n_neurons=32, n_hidden_layers=2, output_dim=1),
            density_activation="softplus", sigma_mlp_bias=True,
            pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
        )
    return FieldConfig(
        pos_encoding_sigma=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )


def _run(kind, point_chunk):
    cfg = OptimizerConfig(
        n_lidar_samples=N_RAYS, n_sky_samples=0, n_samples_per_ray=N_SAMPLES,
        window_size=W, occ_voxel_size=8, ray_range=(0.5, 12.0),
        point_chunk=point_chunk, steps_per_dispatch=2,
        samples_strategy="OGM",
    )
    field_cfg = _field_cfg(kind)
    rng = np.random.default_rng(0)
    dirs, deps = [], []
    for _ in range(W):
        d = rng.normal(size=(3, 256))
        dirs.append((d / np.linalg.norm(d, axis=0)).astype(np.float32))
        deps.append(rng.uniform(1.0, 10.0, 256).astype(np.float32))
    buffers = build_window_buffers(dirs, deps, [None] * W, W)
    phase = PhaseSettings(num_iterations=2)
    runner = make_phase_runner(
        cfg, field_cfg, phase, W, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )
    params = init_field_params(jax.random.key(0), field_cfg)
    occ = init_occ_grid(8)
    twists = jnp.zeros((W, 6), jnp.float32)
    new_params, _, new_twists, losses, _ = runner(
        params, occ, twists, buffers, jnp.ones((W,), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
        0, jax.random.key(1), num_iterations=2,
    )
    return (
        np.asarray(losses),
        np.asarray(new_twists),
        jax.tree.map(np.asarray, new_params),
    )


@pytest.mark.parametrize("kind", ["fourier", "hash"])
def test_chunked_matches_unchunked(kind):
    losses_0, twists_0, params_0 = _run(kind, point_chunk=0)
    losses_c, twists_c, params_c = _run(kind, point_chunk=2048)
    np.testing.assert_allclose(losses_c, losses_0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(twists_c, twists_0, rtol=1e-4, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6),
        params_0,
        params_c,
    )
