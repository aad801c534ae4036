"""Proposal-MLP occupancy field: the TPU-native importance sampler.

Functional re-expression of the reference's OccupancyGridModel
(src/models/model_tcnn.py:108-131) and its SGD update
(src/mapping/optimizer.py:598-609). The reference keeps a 100^3 logit
voxel grid read with grid_sample and written through its autodiff —
per-sample random gathers and a scatter-add, which on this TPU toolchain
lower to serialized loops (measured ~62 ns per scattered update; the
grid update alone would cost ~0.5 s). The TPU-native equivalent keeps the
same ROLE and the same training signal but stores the occupancy log-odds
field in a small Fourier MLP:

  * sampling guidance: logits = MLP(RFF(x)), probs = sigmoid(logits),
    clipped into [0.5, 1] and renormalized exactly like the grid path
    (src/models/ray_sampling.py:46-92)
  * training: the reference pushes point logits toward +/-1 inside/
    outside a margin around the measured depth via an explicit gradient
    (src/models/losses.py:54-62). Here the identical update direction is
    expressed as a linear loss  mean(stop_grad(logits_grad) * logits)
    whose autodiff gradient w.r.t. the MLP matches the reference's
    ``point_logits.backward(gradient=logits_grad)`` — dense matmuls only.
  * cadence: the proposal trains EVERY iteration with Adam at
    ``occ_model.prop_lr`` on a strided subset of the sample points
    (``prop_train_subsample``) — the stride plays the role of the
    reference's every-``N_iters_acc`` grid update (same signal density
    per unit compute). ``occ_model.lr`` / ``N_iters_acc`` only apply to
    the OGM (voxel-grid) strategy.

The proposal parameter pytree travels in the optimizer/checkpoint slot
the occupancy grid otherwise occupies ("occ_model_state_dict"), so the
mapper, checkpoints, and all offline analysis tools are agnostic to
which sampler implementation a run used.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ProposalConfig:
    n_freqs: int = 16
    scale: float = 3.0
    n_neurons: int = 64
    n_hidden_layers: int = 2
    seed: int = 4321

    @staticmethod
    def from_settings(cfg: dict) -> "ProposalConfig":
        return ProposalConfig(
            n_freqs=int(cfg.get("n_freqs", 16)),
            scale=float(cfg.get("scale", 3.0)),
            n_neurons=int(cfg.get("n_neurons", 64)),
            n_hidden_layers=int(cfg.get("n_hidden_layers", 2)),
            seed=int(cfg.get("seed", 4321)),
        )


DEFAULT_PROPOSAL = ProposalConfig()


def init_proposal_params(key: jax.Array, cfg: ProposalConfig = DEFAULT_PROPOSAL) -> Dict[str, Any]:
    """Parameter pytree. ``bmat`` (the RFF projection) is stored in the
    pytree so checkpoints are self-contained, but is frozen: the logits
    stop its gradient, so Adam never moves it."""
    dims = [2 * cfg.n_freqs + 3] + [cfg.n_neurons] * cfg.n_hidden_layers + [1]
    params: Dict[str, Any] = {
        "bmat": jax.random.normal(jax.random.key(cfg.seed), (3, cfg.n_freqs), jnp.float32)
        * cfg.scale
        * (2.0 * jnp.pi)
    }
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        bound = jnp.sqrt(6.0 / d_in)
        params[f"w{i}"] = jax.random.uniform(
            sub, (d_in, d_out), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return params


def is_proposal_state(state: Any) -> bool:
    """True if an occupancy-slot value is a proposal pytree rather than a
    dense logit grid array."""
    return isinstance(state, dict)


def proposal_logits(params: Dict[str, Any], points: jax.Array) -> jax.Array:
    """Occupancy log-odds at points in [-1, 1]^3. points: (..., 3) -> (...)."""
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    proj = jnp.dot(
        p, jax.lax.stop_gradient(params["bmat"]),
        precision=jax.lax.Precision.HIGHEST,
    )
    h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj), p], axis=-1)
    n_layers = sum(1 for k in params if k.startswith("w"))
    for i in range(n_layers):
        h = jnp.dot(h, params[f"w{i}"], preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h[..., 0].reshape(shape)
