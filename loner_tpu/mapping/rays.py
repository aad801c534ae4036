"""Device-side differentiable ray building from keyframe point buffers.

TPU-native counterpart of the reference's host-side ray construction
(src/common/ray_utils.py:269-322, src/mapping/keyframe.py:71-101,
src/mapping/optimizer.py:285-340). Architectural inversion: instead of
gathering rays on the CPU each iteration and shipping them to the device,
every keyframe's full point buffer is padded to a fixed size and kept
HBM-resident for the whole window optimization; per-iteration ray index
sampling, pose application, world-cube scaling, and near/far computation
all happen inside the jitted step. Gradients flow loss -> ray origins &
directions -> pose twists.

Shapes are static: W window slots x P points (padded); invalid slots/rays
are masked, never filtered (XLA-friendly).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.common import se3
from loner_tpu.models.rendering import pack_rays


def get_far_val(origins: jax.Array, dirs: jax.Array, eps: float = 1e-15) -> jax.Array:
    """Distance along each ray to the exit of the [-1, 1]^3 cube
    (reference ray_utils.py:31-60). origins/dirs: (N, 3) -> (N,)."""
    d = dirs + eps
    t_neg = jnp.maximum((-1.0 - origins) / d, 0.0)
    t_pos = jnp.maximum((1.0 - origins) / d, 0.0)
    return jnp.maximum(t_neg, t_pos).min(axis=-1)


@jax.tree_util.register_dataclass
@dataclass
class WindowBuffers:
    """HBM-resident window of keyframe scans, fixed shape.

    dirs:      (W, P, 3) sensor-frame unit ray directions (padded)
    depths:    (W, P)    measured ranges in meters (padding: 0)
    counts:    (W,)      valid point count per slot
    sky_dirs:  (W, PS, 3) sensor-frame sky directions (padded)
    sky_counts:(W,)      valid sky count per slot
    slot_valid:(W,)      bool, False for empty window slots
    """

    dirs: jax.Array
    depths: jax.Array
    counts: jax.Array
    sky_dirs: jax.Array
    sky_counts: jax.Array
    slot_valid: jax.Array


def _pad_pow2(n: int, minimum: int = 4096) -> int:
    """Quantized size class: next power of two (bounds recompiles)."""
    p = minimum
    while p < n:
        p *= 2
    return p


def pack_scan_slot(
    d: np.ndarray,  # (3, N) sensor-frame dirs
    z: np.ndarray,  # (N,) ranges
    sky: Optional[np.ndarray],  # (3, M) or None
    p: int,
    sky_pad: int,
):
    """Pack ONE scan into the padded slot layout shared by the host
    window builder and the device scan pool (they must stay bit-for-bit
    identical: the warm-up path pre-compiles against the host layout).

    Returns (dirs (P,3), depths (P,), count, sky_dirs (PS,3), sky_count)
    as numpy arrays. Padding repeats the first point so gathers stay
    in-range; depth padding is 0."""
    n = d.shape[1]
    dirs = np.zeros((p, 3), np.float32)
    dirs[:n] = d.T
    dirs[n:] = d[:, 0]
    depths = np.zeros((p,), np.float32)
    depths[:n] = z
    sdirs = np.zeros((sky_pad, 3), np.float32)
    ns = 0
    if sky is not None and sky.shape[1] > 0:
        ns = min(sky.shape[1], sky_pad)
        sdirs[:ns] = sky[:, :ns].T
    return dirs, depths, n, sdirs, ns


def build_window_buffers(
    scans_dirs: List[np.ndarray],
    scans_depths: List[np.ndarray],
    sky_dirs: List[Optional[np.ndarray]],
    window_size: int,
    sky_pad: int = 4096,
) -> WindowBuffers:
    """Pack host scans into fixed-shape device buffers.

    scans_dirs[i]: (3, N_i) sensor-frame dirs; scans_depths[i]: (N_i,).
    Empty slots replicate slot 0's data but are masked invalid.
    """
    w = window_size
    m = len(scans_dirs)
    assert 1 <= m <= w
    p = _pad_pow2(max(d.shape[1] for d in scans_dirs))

    dirs = np.zeros((w, p, 3), np.float32)
    depths = np.zeros((w, p), np.float32)
    counts = np.zeros((w,), np.int32)
    sdirs = np.zeros((w, sky_pad, 3), np.float32)
    scounts = np.zeros((w,), np.int32)
    valid = np.zeros((w,), bool)

    for i in range(w):
        j = min(i, m - 1)
        dirs[i], depths[i], counts[i], sdirs[i], scounts[i] = pack_scan_slot(
            scans_dirs[j], scans_depths[j], sky_dirs[j], p, sky_pad
        )
        valid[i] = i < m

    return WindowBuffers(
        jnp.asarray(dirs),
        jnp.asarray(depths),
        jnp.asarray(counts),
        jnp.asarray(sdirs),
        jnp.asarray(scounts),
        jnp.asarray(valid),
    )


@jax.tree_util.register_dataclass
@dataclass
class CameraWindowBuffers:
    """HBM-resident window of keyframe camera images, fixed shape.

    The camera-supervision path (reference keyframe.py:103-127 +
    ray_utils.py:176-214; dormant there — ``should_enable_camera`` is
    hardwired False, optimizer.py:433 — live here): per-iteration pixel
    sampling over these buffers trains the intensity head.

    cam_dirs:   (HW, 3) CAMERA-frame pixel ray directions (undistorted,
                shared across keyframes — one calibration per run)
    intensities:(W, HW, C) per-keyframe pixel values in [0, 1]
    has_image:  (W,) bool, False for slots without a matched image
    lidar_to_camera: (4, 4) extrinsic (lidar pose -> camera pose)
    """

    cam_dirs: jax.Array
    intensities: jax.Array
    has_image: jax.Array
    lidar_to_camera: jax.Array


def build_camera_window_buffers(
    images: List[Optional[np.ndarray]],  # per-slot (H, W, C) in [0,1] or None
    cam_dirs: np.ndarray,  # (HW, 3) camera-frame pixel dirs
    lidar_to_camera: np.ndarray,  # (4, 4)
    window_size: int,
    num_colors: int = 3,
) -> CameraWindowBuffers:
    """Pack per-keyframe images into fixed-shape device buffers. Slots
    without an image hold zeros and are masked via ``has_image``."""
    w = window_size
    hw = cam_dirs.shape[0]
    intens = np.zeros((w, hw, num_colors), np.float32)
    has = np.zeros((w,), bool)
    for i, img in enumerate(images[:w]):
        if img is None:
            continue
        flat = np.asarray(img, np.float32).reshape(-1, img.shape[-1] if img.ndim == 3 else 1)
        if flat.shape[-1] != num_colors:
            flat = np.broadcast_to(flat[:, :1], (flat.shape[0], num_colors))
        n = min(flat.shape[0], hw)
        intens[i, :n] = flat[:n]
        has[i] = True
    return CameraWindowBuffers(
        jnp.asarray(cam_dirs, jnp.float32),
        jnp.asarray(intens),
        jnp.asarray(has),
        jnp.asarray(lidar_to_camera, jnp.float32),
    )


def sample_and_build_camera_rays(
    key: jax.Array,
    cam: CameraWindowBuffers,
    twists: jax.Array,  # (W, 6)
    world_scale: jax.Array,
    world_shift: jax.Array,
    ray_range: Tuple[float, float],
    n_camera: int,
    slot_valid: jax.Array,  # (W,) window-slot validity
    detach_poses: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample pixel indices per slot and build LONER-format camera rays
    on device (reference ray_utils.py:176-214 semantics: origin = camera
    position in cube coords, far = cube-exit distance, near =
    range[0]/scale).

    With ``detach_poses`` (the reference's ``detach_rgb_from_poses``
    knob, keyframe.py:117-119, default True) poses are stop_gradient'ed:
    camera supervision trains the INTENSITY head only — pose
    optimization stays lidar-driven. Setting it False lets camera MSE
    gradients reach the pose twists too.

    Returns (rays (B, 11), intensities (B, C), valid (B,)) with
    B = W * n_camera.
    """
    w = twists.shape[0]
    hw = cam.cam_dirs.shape[0]

    u = jax.random.uniform(key, (w, n_camera))
    idx = jnp.minimum((u * hw).astype(jnp.int32), hw - 1)

    dirs_c = cam.cam_dirs[idx.reshape(-1)].reshape(w, n_camera, 3)
    intens = jnp.take_along_axis(cam.intensities, idx[..., None], axis=1)

    mats = se3.twist_to_matrix(twists)  # (W, 4, 4)
    if detach_poses:
        mats = jax.lax.stop_gradient(mats)
    cam_mats = mats @ cam.lidar_to_camera[None]

    dirs_w = jnp.einsum(
        "wij,wbj->wbi", cam_mats[:, :3, :3], dirs_c,
        precision=jax.lax.Precision.HIGHEST,
    )
    dirs_w = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    origins = (cam_mats[:, None, :3, 3] + world_shift) / world_scale
    origins = jnp.broadcast_to(origins, dirs_w.shape)

    b = w * n_camera
    origins = origins.reshape(b, 3)
    dirs_w = dirs_w.reshape(b, 3)
    near = jnp.full((b,), ray_range[0] / world_scale, dtype=origins.dtype)
    far = get_far_val(origins, dirs_w)

    valid = jnp.broadcast_to(
        (slot_valid & cam.has_image)[:, None], (w, n_camera)
    ).reshape(b)
    valid = valid & (jnp.abs(origins).max(axis=-1) <= 1.0)

    rays = pack_rays(origins, dirs_w, near, far)
    return rays, intens.reshape(b, -1), valid


class DeviceScanPool:
    """Per-keyframe scan store resident in HBM.

    The host window builder re-ships the whole 8-slot window (several MB)
    over the host->device link on EVERY keyframe optimization, although
    7 of the 8 scans were already on device the previous round. The pool
    uploads each keyframe's padded scan ONCE (when it is first seen) and
    assembles window buffers with an on-device stack — per-KF transfer
    drops from ~8 MB to ~1 MB at reference scan sizes.

    All scans pad to one shared pow2 size class (``_pad_pow2``), so the
    stacked window matches the host builder bit-for-bit and hits the same
    compiled phase programs. A scan exceeding the current class migrates
    the pool (device-side re-pad; rare — scan sizes are sensor-fixed).

    Entries are keyed by the keyframe's monotonic ``uid`` (never by
    ``id()``, which CPython reuses after GC) and never evicted: at ~1 MB
    per 65k-point scan, 16 GB of HBM holds hours of keyframes (the
    reference equivalently keeps every KF scan in host memory,
    src/mapping/keyframe_manager.py). If keyframe culling is ever added,
    implement eviction here alongside it — the uid key guarantees a
    stale entry can only miss, never alias another keyframe's scan.
    """

    def __init__(self, sky_pad: int = 4096) -> None:
        self._entries: dict = {}
        self._p: Optional[int] = None
        self._sky_pad = sky_pad

    def _pack(self, kf, use_mask: bool):
        d = kf.scan_dirs(use_mask)
        z = kf.scan_depths(use_mask)
        sky = kf.sky_dirs()
        n = d.shape[1]
        if self._p is None or n > self._p:
            new_p = _pad_pow2(n)
            if self._entries:
                # Migrate existing entries on device (repeat-first-point
                # padding preserved: pad rows replicate index 0).
                for e in self._entries.values():
                    pad = new_p - e["dirs"].shape[0]
                    e["dirs"] = jnp.concatenate(
                        [e["dirs"], jnp.broadcast_to(e["dirs"][:1], (pad, 3))]
                    )
                    e["depths"] = jnp.concatenate(
                        [e["depths"], jnp.zeros((pad,), jnp.float32)]
                    )
            self._p = new_p
        dirs, depths, count, sdirs, ns = pack_scan_slot(
            d, z, sky, self._p, self._sky_pad
        )
        return {
            "dirs": jnp.asarray(dirs),
            "depths": jnp.asarray(depths),
            "count": count,
            "sky_dirs": jnp.asarray(sdirs),
            "sky_count": ns,
        }

    def build_window(self, window: list, window_size: int, use_mask: bool) -> WindowBuffers:
        """WindowBuffers for a keyframe window; uploads only unseen scans.

        Semantics match ``build_window_buffers``: empty slots replicate
        slot 0's scan and are masked invalid.
        """
        w = window_size
        m = len(window)
        assert 1 <= m <= w
        entries = []
        for kf in window:
            key = (kf.uid, use_mask)
            if key not in self._entries:
                self._entries[key] = self._pack(kf, use_mask)
            entries.append(self._entries[key])
        slots = [entries[min(i, m - 1)] for i in range(w)]
        # ONE jitted dispatch for the whole assembly (vs one per stacked
        # field): per-dispatch host->device latency dominates window
        # assembly on tunneled/remote transports.
        return _assemble_window(
            tuple(e["dirs"] for e in slots),
            tuple(e["depths"] for e in slots),
            tuple(e["sky_dirs"] for e in slots),
            np.asarray([e["count"] for e in slots], np.int32),
            np.asarray([e["sky_count"] for e in slots], np.int32),
            np.asarray([i < m for i in range(w)]),
        )


@jax.jit
def _assemble_window(dirs, depths, sky_dirs, counts, sky_counts, slot_valid):
    return WindowBuffers(
        jnp.stack(dirs), jnp.stack(depths), jnp.asarray(counts),
        jnp.stack(sky_dirs), jnp.asarray(sky_counts), jnp.asarray(slot_valid),
    )


def sample_and_build_rays(
    key: jax.Array,
    buffers: WindowBuffers,
    twists: jax.Array,  # (W, 6) — differentiable pose parameters
    world_scale: jax.Array,  # scalar
    world_shift: jax.Array,  # (3,)
    ray_range: Tuple[float, float],
    n_lidar: int,
    n_sky: int,
    fixed_indices: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sample ray indices per slot and build LONER-format rays, on device.

    Returns (rays (B, 11) in cube coords, depths_cube (B,), valid (B,))
    with B = W * (n_lidar + n_sky). Sky rays use stop_gradient'ed poses and
    depth = ray_range[1] + 1 (transparent supervision), mirroring
    keyframe.py:87-101. Rays with < 1 m inside the cube are masked, not
    dropped (ray_utils.py:318-322).
    """
    w, p, _ = buffers.dirs.shape
    ps = buffers.sky_dirs.shape[1]
    k_lidar, k_sky = jax.random.split(key)

    if fixed_indices:
        idx = jnp.broadcast_to(jnp.arange(n_lidar, dtype=jnp.int32), (w, n_lidar))
        idx = jnp.minimum(idx, buffers.counts[:, None] - 1)
    else:
        u = jax.random.uniform(k_lidar, (w, n_lidar))
        idx = jnp.floor(u * buffers.counts[:, None].astype(u.dtype)).astype(jnp.int32)
        idx = jnp.minimum(idx, buffers.counts[:, None] - 1)

    dirs_s = jnp.take_along_axis(buffers.dirs, idx[..., None], axis=1)  # (W, n, 3)
    depths_m = jnp.take_along_axis(buffers.depths, idx, axis=1)  # (W, n)
    lidar_valid = jnp.broadcast_to(buffers.slot_valid[:, None], (w, n_lidar))

    if n_sky > 0:
        us = jax.random.uniform(k_sky, (w, n_sky))
        sidx = jnp.floor(
            us * jnp.maximum(buffers.sky_counts[:, None], 1).astype(us.dtype)
        ).astype(jnp.int32)
        sky_s = jnp.take_along_axis(buffers.sky_dirs, sidx[..., None], axis=1)
        sky_depths = jnp.full((w, n_sky), ray_range[1] + 1.0, dtype=jnp.float32)
        sky_valid = buffers.slot_valid[:, None] & (buffers.sky_counts[:, None] > 0)
        sky_valid = jnp.broadcast_to(sky_valid, (w, n_sky))

        all_dirs = jnp.concatenate([dirs_s, sky_s], axis=1)  # (W, n+s, 3)
        all_depths = jnp.concatenate([depths_m, sky_depths], axis=1)
        all_valid = jnp.concatenate([lidar_valid, sky_valid], axis=1)
        is_sky = jnp.concatenate(
            [jnp.zeros((w, n_lidar), bool), jnp.ones((w, n_sky), bool)], axis=1
        )
    else:
        all_dirs, all_depths, all_valid = dirs_s, depths_m, lidar_valid
        is_sky = jnp.zeros((w, n_lidar), bool)

    mats = se3.twist_to_matrix(twists)  # (W, 4, 4) — differentiable
    mats_det = jax.lax.stop_gradient(mats)
    rot = jnp.where(is_sky[..., None, None], mats_det[:, None, :3, :3], mats[:, None, :3, :3])
    trans = jnp.where(is_sky[..., None], mats_det[:, None, :3, 3], mats[:, None, :3, 3])

    # World-frame directions, normalized (ray_utils.py:293-297).
    # HIGHEST: bf16 matmul passes would put ~0.4% error on world-frame
    # directions -> centimeter-scale depth-supervision bias.
    dirs_w = jnp.einsum(
        "wbij,wbj->wbi", rot, all_dirs, precision=jax.lax.Precision.HIGHEST
    )
    dirs_w = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)

    # World-cube origins (ray_utils.py:282-284).
    origins = (trans + world_shift) / world_scale
    origins = jnp.broadcast_to(origins, dirs_w.shape)

    b = w * all_dirs.shape[1]
    origins = origins.reshape(b, 3)
    dirs_w = dirs_w.reshape(b, 3)
    depths_cube = (all_depths / world_scale).reshape(b)
    valid = all_valid.reshape(b)

    near = jnp.full((b,), ray_range[0] / world_scale, dtype=origins.dtype)
    far_range = ray_range[1] / world_scale
    far_clip = get_far_val(origins, dirs_w)
    far = jnp.minimum(far_range, far_clip)

    # Only rays with > 1 m inside the cube are used (ray_utils.py:321).
    valid = valid & (far > near + 1.0 / world_scale)
    # Guard: origins must be inside the cube (ray_utils.py:302 asserts).
    valid = valid & (jnp.abs(origins).max(axis=-1) <= 1.0)

    rays = pack_rays(origins, dirs_w, near, far)
    return rays, depths_cube, valid
