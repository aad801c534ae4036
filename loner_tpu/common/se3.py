"""SO(3)/SE(3) math in JAX.

TPU-native replacement for the reference's pytorch3d.transforms usage
(reference: src/common/pose_utils.py:255-302, src/common/pose.py:140-166,
src/common/sensors.py:176-232). All functions are pure, batch-friendly
(leading dims broadcast), jit/vmap/grad-safe, and avoid NaN gradients at
the identity rotation via masked Taylor expansions.

Pose convention (matches the reference): a pose "twist" is a 6-vector
``[t_x, t_y, t_z, r_x, r_y, r_z]`` where ``t`` is the raw translation and
``r`` is an axis-angle rotation vector. Note this is (t, so3) — NOT the
true se(3) exponential coordinates (the reference stores translation
directly, see pose_utils.py:255-302); we keep that convention so
checkpoints and trajectory splicing behave identically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL = 1e-8


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues formula, (..., 3) -> (..., 3, 3). Grad-safe at 0."""
    theta2 = jnp.sum(aa * aa, axis=-1)[..., None, None]
    small = theta2 < _SMALL
    # Masked sqrt so the gradient of sqrt at 0 never appears in either branch.
    safe_theta2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta = jnp.sqrt(safe_theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_theta2)
    k = skew(aa)
    # k @ k == v v^T - (v.v) I in closed form: exact on TPU (the default
    # 3x3 matmul would otherwise run at bf16 MXU precision).
    vvt = aa[..., :, None] * aa[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), k.shape)
    k2 = vvt - theta2 * eye
    return eye + a * k + b * k2


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) unit quaternion [w, x, y, z], branchless.

    Shepperd's method: evaluate all four candidate quaternions (one per
    dominant diagonal term), then select the numerically best per element.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    keys = [m00 + m11 + m22, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22]
    # Raw candidates: the dominant slot holds d_i = 1 + key_i; after dividing
    # by 2*sqrt(d_i), the dominant component becomes sqrt(d_i)/2 as required.
    raws = [
        jnp.stack([1.0 + keys[0], m21 - m12, m02 - m20, m10 - m01], axis=-1),
        jnp.stack([m21 - m12, 1.0 + keys[1], m01 + m10, m02 + m20], axis=-1),
        jnp.stack([m02 - m20, m01 + m10, 1.0 + keys[2], m12 + m21], axis=-1),
        jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + keys[3]], axis=-1),
    ]
    scaled = []
    for raw, key in zip(raws, keys):
        d = jnp.maximum(1.0 + key, 1e-12)[..., None]
        scaled.append(raw / (2.0 * jnp.sqrt(d)))
    idx = jnp.argmax(jnp.stack(keys, axis=-1), axis=-1)
    stacked = jnp.stack(scaled, axis=-2)  # (..., candidate, 4)
    gather_idx = jnp.broadcast_to(
        idx[..., None, None], idx.shape + (1, 4)
    ).astype(jnp.int32)
    q = jnp.take_along_axis(stacked, gather_idx, axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) [w,x,y,z] -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """(..., 4) [w,x,y,z] -> (..., 3) axis-angle."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = vn2 < _SMALL
    vn = jnp.sqrt(jnp.where(small, jnp.ones_like(vn2), vn2))
    angle = 2.0 * jnp.arctan2(vn[..., 0], w)[..., None]
    # For small |v|, angle/|v| -> 2/w (Taylor): aa = v * 2/w approx.
    scale = jnp.where(small, 2.0 / jnp.maximum(w[..., None], 1e-6), angle / vn)
    return v * scale


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 4) [w,x,y,z]."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small = theta2 < _SMALL
    theta = jnp.sqrt(jnp.where(small, jnp.ones_like(theta2), theta2))
    half = 0.5 * theta
    sinc_half = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, aa * sinc_half], axis=-1)


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(m))


def twist_to_matrix(twist: jax.Array) -> jax.Array:
    """[t(3), axis-angle(3)] (..., 6) -> (..., 4, 4) homogeneous transform."""
    t = twist[..., :3]
    rot = axis_angle_to_matrix(twist[..., 3:])
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=twist.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_twist(m: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) [t, axis-angle]."""
    return jnp.concatenate([m[..., :3, 3], matrix_to_axis_angle(m[..., :3, :3])], axis=-1)


def transform_inverse(m: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 4, 4) rigid transforms."""
    r = m[..., :3, :3]
    t = m[..., :3, 3:]
    r_inv = jnp.swapaxes(r, -1, -2)
    t_inv = -r_inv @ t
    top = jnp.concatenate([r_inv, t_inv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=m.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(m: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (4, 4) (or batched) transform to (..., 3) points."""
    # HIGHEST: TPU f32 matmuls default to bf16 passes (~0.4% coordinate
    # error at room scale); point transforms must stay exact-f32.
    return jnp.matmul(
        pts, jnp.swapaxes(m[..., :3, :3], -1, -2),
        precision=jax.lax.Precision.HIGHEST,
    ) + m[..., :3, 3]


def interpolate_transforms(
    t_start: jax.Array, t_end: jax.Array, alpha: jax.Array
) -> jax.Array:
    """Pose interpolation: lerp translation, slerp rotation via axis-angle.

    Mirrors the reference's motion-compensation interpolation
    (src/common/sensors.py:186-220): rotation interpolated in the *relative*
    frame R_start @ exp(alpha * log(R_start^T R_end)).

    t_start, t_end: (4, 4); alpha: (N,). Returns (N, 4, 4).
    """
    alpha = alpha[..., None]
    trans = t_start[:3, 3] + (t_end[:3, 3] - t_start[:3, 3]) * alpha
    r_start = t_start[:3, :3]
    rel = r_start.T @ t_end[:3, :3]
    rel_aa = matrix_to_axis_angle(rel)
    rots = r_start @ axis_angle_to_matrix(rel_aa * alpha)
    top = jnp.concatenate([rots, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
