"""Mesher: extract a triangle mesh from the trained field.

TPU-native counterpart of analysis/mesher.py + meshing.py (reference
mesher.py:103-226): NOT SDF marching — virtual scans are rendered from
every ``skip_step``-th keyframe pose, each ray's per-sample rendering
*weights* are splatted into a uniform grid with a max-reduce, and
marching cubes runs at ``level`` on that weight grid, rescaled out of the
world cube. Splatting runs on device (scatter-max); marching cubes stays
host-side (scikit-image when present, else the built-in vectorized
marching-tetrahedra, loner_tpu/ops/marching.py).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.analysis.render_utils import (
    LoadedModel,
    kf_pose_matrices,
    load_experiment,
)
from loner_tpu.analysis.renderer_lidar import build_lidar_ray_directions
from loner_tpu.mapping.rays import get_far_val
from loner_tpu.models.rendering import pack_rays


@jax.jit
def _splat_weights_max(
    grid: jax.Array,  # (V, V, V)
    points: jax.Array,  # (N, 3) in cube coords
    weights: jax.Array,  # (N,)
    lo: jax.Array,  # (3,) grid lower corner, cube coords
    hi: jax.Array,  # (3,) grid upper corner, cube coords
) -> jax.Array:
    """Max-reduce sample weights into the voxel grid (reference
    mesher.py:130-180 does the same splat on the host). Samples outside
    [lo, hi] clamp onto the boundary cells, matching the reference's
    bucketize-into-bounded-grid behavior (mesher.py:141-149)."""
    v = grid.shape[0]
    frac = (points - lo) / (hi - lo)
    ijk = jnp.clip((frac * v).astype(jnp.int32), 0, v - 1)
    flat = ijk[:, 0] * v * v + ijk[:, 1] * v + ijk[:, 2]
    out = grid.reshape(-1).at[flat].max(weights)
    return out.reshape(v, v, v)


def build_weight_grid(
    model: LoadedModel,
    pose_mats: np.ndarray,
    ray_range: Tuple[float, float],
    resolution: int = 256,
    n_samples: int = 512,
    num_channels: int = 64,
    num_columns: int = 512,
    chunk: int = 8192,
    vertical_fov: Tuple[float, float] = (-22.5, 22.5),
    bound: Optional[np.ndarray] = None,  # (2, 3) lo/hi in cube coords
) -> np.ndarray:
    from loner_tpu.analysis._render_impl import get_chunk_renderer

    cube = model.world_cube
    if bound is None:
        bound = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    lo = jnp.asarray(bound[0], jnp.float32)
    hi = jnp.asarray(bound[1], jnp.float32)
    # One jitted render program shared across poses/chunks (an eager
    # render at these shapes materializes every sampler intermediate —
    # the same multi-GB failure render_depth_chunked hit).
    render_chunk = get_chunk_renderer(model, n_samples, ret_var=False, use_occ=True)
    dirs_sensor = build_lidar_ray_directions(num_channels, num_columns, vertical_fov)
    grid = jnp.zeros((resolution,) * 3, jnp.float32)

    for pose in pose_mats:
        dirs_world = dirs_sensor @ pose[:3, :3].T
        o_cube = cube.to_cube(pose[:3, 3])
        for i in range(0, dirs_world.shape[0], chunk):
            d = jnp.asarray(dirs_world[i : i + chunk], jnp.float32)
            o = jnp.broadcast_to(jnp.asarray(o_cube, jnp.float32), d.shape)
            near = jnp.full((d.shape[0],), ray_range[0] / cube.scale_factor, jnp.float32)
            far = jnp.minimum(ray_range[1] / cube.scale_factor, get_far_val(o, d))
            rays = pack_rays(o, d, near, far)
            out = render_chunk(rays, model.field_params, model.occ_grid)
            grid = _splat_weights_max(
                grid,
                out["points"].reshape(-1, 3),
                out["weights"].reshape(-1),
                lo,
                hi,
            )
    return np.asarray(grid)


def get_mesh(
    log_dir: str,
    ckpt_name: str = "final.tar",
    resolution: int = 256,
    level: float = 0.1,
    skip_step: int = 4,
    use_gt_poses: bool = False,
    out_file: Optional[str] = None,
    vertical_fov: Optional[Tuple[float, float]] = None,
):
    """Extract and save the mesh as .ply; returns (verts, faces).

    The virtual-scan vertical FOV defaults to the experiment config's
    ``lidar_vertical_fov`` (the reference threads the same key from the
    sequence yaml into its Mesher, meshing.py:120, mesher.py:56-68).
    """
    try:
        from skimage.measure import marching_cubes
    except ImportError:
        from loner_tpu.ops.marching import marching_cubes_compat as marching_cubes

    model = load_experiment(log_dir, ckpt_name)
    mats, _ = kf_pose_matrices(model, use_gt=use_gt_poses)
    ray_range = tuple(
        float(x)
        for x in model.settings.mapper.optimizer.model_config["data"]["ray_range"]
    )
    if vertical_fov is None:
        vertical_fov = tuple(
            float(x)
            for x in model.settings.get("lidar_vertical_fov", (-22.5, 22.5))
        )
    # The sequence config's meshing_bounding_box (world meters) restricts
    # the marching grid to the region of interest, so grid resolution is
    # spent inside it (reference meshing.py:56-58, mesher.py:112).
    bbox = model.settings.get("meshing_bounding_box")
    if bbox is not None:
        lo_w = np.array([bbox["x"][0], bbox["y"][0], bbox["z"][0]], np.float32)
        hi_w = np.array([bbox["x"][1], bbox["y"][1], bbox["z"][1]], np.float32)
        bound = np.stack(
            [model.world_cube.to_cube(lo_w), model.world_cube.to_cube(hi_w)]
        ).astype(np.float32)
        # Stay inside the cube: the field is untrained outside it.
        bound = np.clip(bound, -1.0, 1.0)
    else:
        bound = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    grid = build_weight_grid(
        model, mats[::skip_step], ray_range,
        resolution=resolution, vertical_fov=vertical_fov, bound=bound,
    )

    verts, faces, normals, _ = marching_cubes(grid, level=level)
    # Grid index -> cube coords -> world meters (reference mesher.py:217-221).
    verts = bound[0] + (verts / resolution) * (bound[1] - bound[0])
    verts = model.world_cube.from_cube(verts)

    out_file = out_file or os.path.join(log_dir, "meshing", "mesh.ply")
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    write_ply(verts, faces, out_file)
    return verts, faces


def write_ply(verts: np.ndarray, faces: np.ndarray, fname: str) -> None:
    with open(fname, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        np.savetxt(f, verts, fmt="%.6f")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def read_ply_vertices(fname: str) -> np.ndarray:
    with open(fname) as f:
        lines = f.readlines()
    n_verts = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
    start = next(i for i, l in enumerate(lines) if l.startswith("end_header")) + 1
    return np.loadtxt(lines[start : start + n_verts], dtype=np.float32)


def sample_mesh_points(
    verts: np.ndarray, faces: np.ndarray, n_points: int, seed: int = 0
) -> np.ndarray:
    """Uniform surface sampling (replaces o3d sample_points_uniformly used
    by the map-metrics pipeline, reference compute_metrics/maps)."""
    rng = np.random.default_rng(seed)
    tri = verts[faces]  # (F, 3, 3)
    areas = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    probs = areas / areas.sum()
    face_idx = rng.choice(len(faces), n_points, p=probs)
    u, v = rng.uniform(size=(2, n_points))
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    t = tri[face_idx]
    return (
        t[:, 0] + u[:, None] * (t[:, 1] - t[:, 0]) + v[:, None] * (t[:, 2] - t[:, 0])
    ).astype(np.float32)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Marching-cubes mesh from checkpoint")
    p.add_argument("experiment_directory")
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--level", type=float, default=0.1)
    p.add_argument("--skip_step", type=int, default=4)
    p.add_argument("--use_gt_poses", action="store_true")
    p.add_argument(
        "--vertical_fov", type=float, nargs=2, default=None,
        help="virtual-scan vertical FOV in degrees "
        "(default: the experiment config's lidar_vertical_fov)",
    )
    args = p.parse_args()
    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"
    verts, faces = get_mesh(
        args.experiment_directory,
        ckpt,
        resolution=args.resolution,
        level=args.level,
        skip_step=args.skip_step,
        use_gt_poses=args.use_gt_poses,
        vertical_fov=args.vertical_fov,
    )
    print(f"mesh: {len(verts)} vertices, {len(faces)} faces")
