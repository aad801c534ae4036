"""Depth-map warping and optical-flow visualization helpers.

TPU-build analog of the reference's depth-warp utilities
(reference: analysis/render_utils.py:8-104 — ``vis_flow`` and
``depth_to_warp``), re-derived in pure numpy with no cv2 dependency.

Conventions (differ from the reference deliberately):
- depths are POSITIVE ray ranges (Euclidean distance from the camera
  center along the pixel ray), matching what our renderer emits
  (analysis/renderer.py depth channel); the reference stores negated
  Open3D depths and flips the sign internally.
- holes (never-observed / out-of-range pixels) are ``np.inf``.
"""
from __future__ import annotations

import numpy as np


def vis_flow(flow: np.ndarray, scale: float = 0.0) -> np.ndarray:
    """Color-code a (H, W, 2) pixel-displacement field as an RGB image.

    Hue encodes flow direction, saturation encodes magnitude (min-max
    normalized unless ``scale`` is given), value is 1 — the standard
    optical-flow wheel (reference render_utils.py:8-17, minus cv2).
    Returns float RGB in [0, 1], shape (H, W, 3).
    """
    fx, fy = flow[..., 0], flow[..., 1]
    mag = np.hypot(fx, fy)
    ang = np.degrees(np.arctan2(fy, fx)) % 360.0
    if scale == 0.0:
        rng = mag.max() - mag.min()
        mag = (mag - mag.min()) / rng if rng > 0 else np.zeros_like(mag)
    else:
        mag = mag / scale
    mag = np.clip(mag, 0.0, 1.0)

    # HSV -> RGB with s=mag, v=1 (vectorized, sector arithmetic)
    h6 = ang / 60.0
    i = np.floor(h6).astype(int) % 6
    f = h6 - np.floor(h6)
    p = 1.0 - mag
    q = 1.0 - mag * f
    t = 1.0 - mag * (1.0 - f)
    one = np.ones_like(mag)
    lut = np.stack(
        [
            np.stack([one, t, p], -1),
            np.stack([q, one, p], -1),
            np.stack([p, one, t], -1),
            np.stack([p, q, one], -1),
            np.stack([t, p, one], -1),
            np.stack([one, p, q], -1),
        ],
        0,
    )  # (6, H, W, 3)
    return np.take_along_axis(lut, i[None, ..., None], axis=0)[0]


def depth_to_warp(
    depth_map1: np.ndarray,
    depth_map2: np.ndarray,
    K1: np.ndarray,
    T12: np.ndarray,
    K2: np.ndarray,
    occlusion_threshold: float = 0.5,
) -> tuple:
    """Pixel warp from camera 1 to camera 2 implied by two depth maps.

    Given ray-range depth maps and intrinsics of two cameras plus the
    relative pose ``T12`` (maps cam1-frame points into the cam2 frame),
    returns ``(warp, mask)`` where ``warp`` is (H, W, 2) pixel
    displacement (u2-u1, v2-v1) and ``mask`` is (H, W, 1) boolean
    visibility: True where the warped point is geometrically consistent
    with ``depth_map2`` (not occluded, not a hole).

    Re-derivation of reference render_utils.py:53-104 with positive
    ray-range depths, numpy-only projection (no distortion — our
    rendered depth maps are from ideal pinhole rays), and the same
    occlusion test: compare the warped point's cam2 range against the
    min range over the 4 integer pixels bracketing its projection.
    """
    assert depth_map1.shape == depth_map2.shape, "depth maps must share a shape"
    H, W = depth_map1.shape
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32)
    )
    u1 = uu.reshape(-1)
    v1 = vv.reshape(-1)
    d1 = depth_map1.reshape(-1).astype(np.float64)
    holes1 = ~np.isfinite(d1)

    fx1, cx1 = K1[0, 0], K1[0, 2]
    fy1, cy1 = K1[1, 1], K1[1, 2]
    x_over_z = (u1 - cx1) / fx1
    y_over_z = (v1 - cy1) / fy1
    # ray range -> z (range is along the unit ray; z is its optical-axis leg)
    z = np.where(holes1, 1.0, d1) / np.sqrt(1.0 + x_over_z**2 + y_over_z**2)
    pts1 = np.stack([x_over_z * z, y_over_z * z, z, np.ones_like(z)], axis=0)

    pts2 = (np.asarray(T12, np.float64) @ pts1)[:3]  # (3, H*W), cam2 frame
    z2 = np.maximum(pts2[2], 1e-9)
    u2 = K2[0, 0] * pts2[0] / z2 + K2[0, 2]
    v2 = K2[1, 1] * pts2[1] / z2 + K2[1, 2]

    warp = np.stack([u2 - u1, v2 - v1], axis=1).reshape(H, W, 2).astype(np.float32)
    warp[~np.isfinite(depth_map1)] = 0.0

    # Occlusion / hole mask: the 4 pixels bracketing the projection
    range2_warped = np.linalg.norm(pts2, axis=0)
    u_lo = np.clip(np.floor(u2).astype(int), 0, W - 1)
    u_hi = np.clip(np.ceil(u2).astype(int), 0, W - 1)
    v_lo = np.clip(np.floor(v2).astype(int), 0, H - 1)
    v_hi = np.clip(np.ceil(v2).astype(int), 0, H - 1)
    behind = pts2[2] <= 0  # projected behind cam2
    neighbor_min = np.minimum.reduce(
        [
            depth_map2[v_lo, u_lo],
            depth_map2[v_lo, u_hi],
            depth_map2[v_hi, u_lo],
            depth_map2[v_hi, u_hi],
        ]
    )
    in_bounds = (u2 >= 0) & (u2 <= W - 1) & (v2 >= 0) & (v2 <= H - 1)
    consistent = np.abs(neighbor_min - range2_warped) < occlusion_threshold
    mask = (consistent & in_bounds & ~behind & ~holes1).reshape(H, W, 1)
    return warp, mask
