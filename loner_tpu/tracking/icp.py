"""Batched point-to-plane ICP in XLA.

TPU-native replacement for Open3D's ``registration_icp`` with
``TransformationEstimationPointToPlane`` (used by the reference tracker,
src/tracking/tracker.py:203-221, with the 2-stage coarse->fine schedule of
cfg/defaults.yaml:146-156). Everything is fixed-shape and jitted:

  * normals: k-NN PCA — brute-force distance matrix on the MXU
    (||a-b||^2 = |a|^2 + |b|^2 - 2 a.b), top-k neighbors, batched 3x3
    eigendecomposition (smallest eigenvector)
  * correspondences: nearest target point per transformed source point
    (one matmul per Gauss-Newton iteration), rejected beyond the stage
    threshold by masking
  * update: 6x6 point-to-plane normal equations, solved in f64-free
    Cholesky-ish solve; pose composed via the SE(3)-style [t, axis-angle]
    increment
  * convergence: relative fitness/RMSE deltas freeze further updates,
    matching Open3D's ICPConvergenceCriteria semantics

Point clouds are padded to a static size with a validity mask.

Scaling: correspondences and normals are brute-force O(N*M) on the MXU —
FLOPs are cheap there; what must stay bounded is the materialized
distance matrix. Beyond 2^26 elements the row axis is blocked via
lax.map (``_map_row_blocks``), so 16k-64k-point clouds run in constant
memory (the default 5120-point tracker clouds stay single-tile — the
fast path). SURVEY §2.3's grid-hash alternative trades MXU matmuls for
per-point hashing, which is the slow direction on this hardware.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.common import se3


class ICPResult(NamedTuple):
    transformation: jax.Array  # (4, 4) source -> target
    fitness: jax.Array  # scalar inlier fraction
    inlier_rmse: jax.Array  # scalar


def orthonormalize_transform(t_mat: jax.Array) -> jax.Array:
    """Nearest SE(3) element (Frobenius): SVD-project the 3x3 rotation
    block, keep the translation. Composed f32 Rodrigues increments are
    orthonormal only to ~1e-5 each; anything that CHAINS transforms must
    re-project or the products walk off the manifold (see
    _icp_schedule_fused)."""
    u, _, vt = jnp.linalg.svd(t_mat[:3, :3])
    det = jnp.linalg.det(u @ vt)
    rot = (u * jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det])) @ vt
    return t_mat.at[:3, :3].set(rot)


def _pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, 3), (M, 3) -> (N, M) squared distances via one matmul (MXU)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T
    # precision=HIGHEST: TPU f32 matmuls default to bf16 passes, which
    # quantize the a^2+b^2-2ab expansion (terms ~100 m^2) by ~1 m —
    # correspondences and normals become garbage on-chip without this.
    cross = jnp.dot(
        a, b.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


# Memory envelope for the brute-force distance matrices. A full matrix
# up to 2^26 f32 elements (256 MB) runs as ONE tile — this keeps both
# the 5120-point tracker clouds and the 8192-point map-eval alignment on
# the fast single-dispatch path. Beyond that, the row axis blocks into
# (block, M) tiles of at most 2^25 elements (128 MB) each.
_SINGLE_TILE_ELEMS = 1 << 26
_BLOCK_BUDGET_ELEMS = 1 << 25


def _row_block(n: int, m: int) -> Optional[int]:
    """Row-block size for an (n, m) distance computation, or None when
    the whole matrix fits the budget (single tile, no lax.map)."""
    if n * m <= _SINGLE_TILE_ELEMS:
        return None
    block = max(_BLOCK_BUDGET_ELEMS // m, 256)
    # Largest power of two <= the budget (clean MXU tiling). The row
    # axis pads up to a block multiple in _map_row_blocks — do NOT
    # require block | n: for a non-pow2 n (e.g. a 10000-point budget)
    # the largest pow2 divisor can be tiny (16), degrading lax.map to
    # hundreds of sequential micro-blocks inside the tracking loop.
    b = 1
    while b * 2 <= block:
        b *= 2
    return min(b, n)


def _map_row_blocks(fn, rows: jax.Array, m: int):
    """Apply ``fn`` ((B, 3) rows -> pytree of (B, ...) outputs) over row
    blocks of ``rows`` sized so each (B, m) distance tile stays inside
    the budget; single call (no lax.map) when the whole matrix fits.
    ``fn`` must be row-independent (each output row depends only on its
    input row) — the ragged tail is padded with row 0 and sliced off."""
    n = rows.shape[0]
    block = _row_block(n, m)
    if block is None:
        return fn(rows)
    n_pad = -(-n // block) * block
    padded = rows
    if n_pad != n:
        padded = jnp.concatenate(
            [rows, jnp.broadcast_to(rows[:1], (n_pad - n, rows.shape[-1]))]
        )
    out = jax.lax.map(fn, padded.reshape(n_pad // block, block, rows.shape[-1]))
    return jax.tree.map(lambda x: x.reshape((n_pad,) + x.shape[2:])[:n], out)


@partial(jax.jit, static_argnames=("k",))
def estimate_normals(points: jax.Array, valid: jax.Array, k: int = 30) -> jax.Array:
    """k-NN PCA normals (Open3D estimate_normals default knn=30).

    points: (N, 3) padded; valid: (N,) bool. Returns (N, 3) unit normals
    (arbitrary orientation — point-to-plane ICP squares the projection, so
    sign is irrelevant).
    """
    def knn_rows(rows):
        d2 = _pairwise_sqdist(rows, points)
        # Push invalid columns to +inf so they're never neighbors.
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        _, nn = jax.lax.top_k(-d2, k)  # (B, k) nearest (incl. self)
        return nn

    # Row-blocked beyond the memory budget (16k+ clouds would otherwise
    # materialize a gigabyte-scale N x N matrix).
    idx = _map_row_blocks(knn_rows, points, points.shape[0])
    nbrs = points[idx]  # (N, k, 3)
    mean = nbrs.mean(axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum(
        "nki,nkj->nij", centered, centered,
        precision=jax.lax.Precision.HIGHEST,
    ) / k  # (N, 3, 3)
    # Batched symmetric 3x3 eigendecomposition; smallest eigenvector.
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]
    return normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)


def _gauss_newton_step(
    src_t: jax.Array,  # (N, 3) transformed source
    tgt: jax.Array,  # (M, 3)
    tgt_normals: jax.Array,  # (M, 3)
    src_valid: jax.Array,
    tgt_valid: jax.Array,
    max_dist: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One point-to-plane GN step. Returns (xi (6,), fitness, rmse)."""

    def nn_rows(rows):
        d2 = _pairwise_sqdist(rows, tgt)
        d2 = jnp.where(tgt_valid[None, :], d2, jnp.inf)
        return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1)

    # Row-blocked beyond the memory budget (O(N*M) FLOPs stay — the MXU
    # eats them; it's the materialized matrix that must stay bounded).
    nn_d2, nn_idx = _map_row_blocks(nn_rows, src_t, tgt.shape[0])

    q = tgt[nn_idx]  # (N, 3)
    n = tgt_normals[nn_idx]
    inlier = src_valid & (nn_d2 <= max_dist * max_dist)
    w = inlier.astype(src_t.dtype)

    r = jnp.sum((src_t - q) * n, axis=-1)  # signed point-to-plane residual
    # Jacobian rows: [cross(p, n), n] for increment [omega, t].
    jac = jnp.concatenate([jnp.cross(src_t, n), n], axis=-1)  # (N, 6)

    jw = jac * w[:, None]
    jtj = jnp.dot(jw.T, jac, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (6, 6)
    jtr = jnp.dot(jw.T, r, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (6,)
    xi = -jnp.linalg.solve(jtj + 1e-6 * jnp.eye(6, dtype=jtj.dtype), jtr)

    n_inlier = jnp.maximum(w.sum(), 1.0)
    fitness = w.sum() / jnp.maximum(src_valid.sum().astype(w.dtype), 1.0)
    rmse = jnp.sqrt((r * r * w).sum() / n_inlier)
    return xi, fitness, rmse


@partial(
    jax.jit,
    static_argnames=("max_iterations",),
)
def registration_icp(
    source: jax.Array,  # (N, 3) padded
    target: jax.Array,  # (M, 3) padded
    target_normals: jax.Array,  # (M, 3)
    source_valid: jax.Array,  # (N,) bool
    target_valid: jax.Array,  # (M,) bool
    max_correspondence_distance: float | jax.Array,
    init: jax.Array,  # (4, 4) initial source -> target
    max_iterations: int = 10,
    relative_fitness: float = 1e-8,
    relative_rmse: float = 1e-8,
) -> ICPResult:
    """Point-to-plane ICP, fixed iteration count with convergence freeze."""
    max_dist = jnp.asarray(max_correspondence_distance, source.dtype)

    def body(carry, _):
        t_mat, prev_fit, prev_rmse, converged = carry
        src_t = jnp.dot(
            source, t_mat[:3, :3].T, precision=jax.lax.Precision.HIGHEST
        ) + t_mat[:3, 3]
        xi, fitness, rmse = _gauss_newton_step(
            src_t, target, target_normals, source_valid, target_valid, max_dist
        )
        omega, trans = xi[:3], xi[3:]
        delta = se3.twist_to_matrix(jnp.concatenate([trans, omega]))
        new_t = delta @ t_mat

        newly_converged = (
            jnp.abs(fitness - prev_fit) < relative_fitness * jnp.maximum(prev_fit, 1e-12)
        ) & (jnp.abs(rmse - prev_rmse) < relative_rmse * jnp.maximum(prev_rmse, 1e-12))
        conv = converged | newly_converged
        t_out = jnp.where(conv, t_mat, new_t)
        return (t_out, fitness, rmse, conv), None

    init_carry = (
        init.astype(source.dtype),
        jnp.asarray(0.0, source.dtype),
        jnp.asarray(jnp.inf, source.dtype),
        jnp.asarray(False),
    )
    (t_mat, fitness, rmse, _), _ = jax.lax.scan(
        body, init_carry, None, length=max_iterations
    )
    return ICPResult(t_mat, fitness, rmse)


# ---------------------------------------------------------------------------
# Host-facing convenience
# ---------------------------------------------------------------------------

def pad_cloud(points: np.ndarray, size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (N, 3) to (size, 3) + validity mask; excess points are dropped
    by uniform stride to preserve coverage."""
    n = points.shape[0]
    if n > size:
        stride_idx = np.linspace(0, n - 1, size).astype(np.int64)
        points = points[stride_idx]
        n = size
    out = np.zeros((size, 3), np.float32)
    out[:n] = points
    # Padding duplicates the first point (keeps distance matrices finite).
    if n > 0:
        out[n:] = points[0]
    valid = np.zeros((size,), bool)
    valid[:n] = True
    return out, valid


@partial(jax.jit, static_argnames=("stage_params", "knn"))
def _icp_schedule_fused(
    src: jax.Array,
    tgt: jax.Array,
    src_valid: jax.Array,
    tgt_valid: jax.Array,
    thresholds: jax.Array,  # (S,) per-stage correspondence distances
    init: jax.Array,
    stage_params: tuple,  # ((max_iters, rel_fitness, rel_rmse), ...)
    knn: int,
) -> ICPResult:
    """Normals + every schedule stage in ONE compiled program: the
    per-frame cost is one dispatch instead of 1 + S, which matters when
    each device round-trip carries tunnel/PCIe latency (the tracker runs
    this at frame rate)."""
    normals = estimate_normals(tgt, tgt_valid, k=knn)
    t_mat = init
    result = None
    for i, (max_iters, rel_fit, rel_rmse) in enumerate(stage_params):
        result = registration_icp(
            src,
            tgt,
            normals,
            src_valid,
            tgt_valid,
            thresholds[i],
            t_mat,
            max_iterations=int(max_iters),
            relative_fitness=float(rel_fit),
            relative_rmse=float(rel_rmse),
        )
        t_mat = result.transformation
    # Project the accumulated transform back onto SE(3). Each GN
    # iteration composes a Rodrigues increment in f32 on-device, which
    # inflates the rotation block by ~1e-4 per CALL; the tracker then
    # multiplies ~5 calls/s into its pose chain, reaching percent-level
    # scale within a minute and warping motion-compensated keyframe
    # scans by half a meter (measured: det drifted to 1.05 over 45 s,
    # ATE 0.084 -> 0.033 after this fix). One 3x3 SVD per frame is
    # noise next to the ICP itself and keeps the result async-safe for
    # the device-chained velocity init.
    return ICPResult(
        orthonormalize_transform(result.transformation),
        result.fitness,
        result.inlier_rmse,
    )


def run_icp_schedule(
    source: np.ndarray,
    target: np.ndarray,
    schedule: list,
    pad_size: int = 5120,
    init: np.ndarray = None,
    knn: int = 30,
    device=None,
) -> ICPResult:
    """2-stage (or N-stage) ICP like the reference tracker
    (tracker.py:205-221): each stage refines the previous stage's result
    with a tighter correspondence threshold. Thresholds are traced (one
    compiled program regardless of their values); stage count/iteration
    caps are static.

    ``device`` (a jax.Device, optional) commits every input to that
    device, so the compiled schedule executes there — the mechanism
    behind ``tracker.icp.device``: on a multi-chip host the tracker's
    ICP runs on its own chip and never queues behind mapping dispatch
    chunks (the single-chip latency floor measured in
    artifacts/track_latency_r4/). A chained device-array ``init``
    produced by a previous call on the same device is re-committed
    for free (device_put is a no-op for already-resident arrays)."""
    src, src_valid = pad_cloud(np.asarray(source, np.float32), pad_size)
    tgt, tgt_valid = pad_cloud(np.asarray(target, np.float32), pad_size)

    thresholds = jnp.asarray(
        [float(s["threshold"]) for s in schedule], jnp.float32
    )
    stage_params = tuple(
        (
            int(s["max_iterations"]),
            float(s.get("relative_fitness", 1e-8)),
            float(s.get("relative_rmse", 1e-8)),
        )
        for s in schedule
    )
    t0 = np.eye(4, dtype=np.float32) if init is None else init.astype(np.float32)
    operands = (
        jnp.asarray(src),
        jnp.asarray(tgt),
        jnp.asarray(src_valid),
        jnp.asarray(tgt_valid),
        thresholds,
        jnp.asarray(t0),
    )
    if device is not None:
        operands = tuple(jax.device_put(x, device) for x in operands)
    return _icp_schedule_fused(*operands, stage_params, knn)
