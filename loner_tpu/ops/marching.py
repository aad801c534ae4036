"""Isosurface extraction: vectorized marching tetrahedra in numpy.

The reference meshes via scikit-image's C marching_cubes
(analysis/mesher.py:192-209); scikit-image is not available in this
environment, so this module provides a dependency-free replacement.
Marching tetrahedra (each cell split into 6 tets around the 0-6 diagonal)
has only 16 cases per tet — derived programmatically below rather than
hard-coded tables — and produces a watertight triangulation of the same
isosurface (slightly more triangles than marching cubes).

API mirrors skimage.measure.marching_cubes: vertices are in grid-index
coordinates.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# Cube corner offsets, standard numbering.
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int64,
)

# 6-tetrahedron decomposition of the cube around the 0-6 diagonal.
_TETS = [(0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6), (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6)]


def _tet_case_triangles(mask: int):
    """Triangles for a tet occupancy mask, as lists of (inside, outside)
    vertex-index pairs (edges crossed by the surface)."""
    inside = [i for i in range(4) if (mask >> i) & 1]
    outside = [i for i in range(4) if not (mask >> i) & 1]
    if len(inside) == 0 or len(inside) == 4:
        return []
    if len(inside) == 1:
        a = inside[0]
        return [[(a, outside[0]), (a, outside[1]), (a, outside[2])]]
    if len(inside) == 3:
        d = outside[0]
        return [[(inside[0], d), (inside[1], d), (inside[2], d)]]
    a, b = inside
    c, d = outside
    # Quad (a,c)-(a,d)-(b,d)-(b,c) -> two triangles.
    return [[(a, c), (a, d), (b, d)], [(a, c), (b, d), (b, c)]]


_CASES = {m: _tet_case_triangles(m) for m in range(16)}


def marching_tetrahedra(
    grid: np.ndarray, level: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface ``grid == level``.

    grid: (X, Y, Z) scalar field. Returns (vertices (V, 3) in index
    coordinates, faces (F, 3) int).
    """
    grid = np.asarray(grid, np.float32)
    nx, ny, nz = grid.shape
    cx, cy, cz = nx - 1, ny - 1, nz - 1

    # Cell base coordinates (flattened).
    bx, by, bz = np.meshgrid(
        np.arange(cx), np.arange(cy), np.arange(cz), indexing="ij"
    )
    base = np.stack([bx.ravel(), by.ravel(), bz.ravel()], axis=1)  # (C, 3)

    # Corner values (8, C).
    vals = np.stack(
        [
            grid[base[:, 0] + dx, base[:, 1] + dy, base[:, 2] + dz]
            for dx, dy, dz in _CORNERS
        ]
    )

    tris = []
    for tet in _TETS:
        tv = vals[list(tet)]  # (4, C)
        inside = tv > level
        case = (
            inside[0].astype(np.int8)
            + 2 * inside[1].astype(np.int8)
            + 4 * inside[2].astype(np.int8)
            + 8 * inside[3].astype(np.int8)
        )
        for m in range(1, 15):
            sel = np.nonzero(case == m)[0]
            if sel.size == 0:
                continue
            for tri_edges in _CASES[m]:
                verts = []
                for vi, vo in tri_edges:
                    ci, co = tet[vi], tet[vo]
                    pa = base[sel] + _CORNERS[ci]
                    pb = base[sel] + _CORNERS[co]
                    va, vb = vals[ci][sel], vals[co][sel]
                    t = (level - va) / np.where(vb == va, 1.0, vb - va)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    verts.append(pa + t * (pb - pa))
                tris.append(np.stack(verts, axis=1))  # (n, 3, 3)

    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    all_tris = np.concatenate(tris, axis=0).astype(np.float32)  # (T, 3, 3)
    # Weld duplicate vertices (quantize to kill float jitter).
    flat = all_tris.reshape(-1, 3)
    keys = np.round(flat * 1e5).astype(np.int64)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    # Representative float coords for each unique vertex.
    verts_out = np.zeros((uniq.shape[0], 3), np.float32)
    verts_out[inverse] = flat
    faces = inverse.reshape(-1, 3)
    # Drop degenerate faces (all mask-boundary cases can collapse).
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts_out, faces[ok]


def marching_cubes_compat(grid: np.ndarray, level: float):
    """skimage.measure.marching_cubes-compatible wrapper:
    returns (verts, faces, normals=None, values=None)."""
    verts, faces = marching_tetrahedra(grid, level)
    return verts, faces, None, None
