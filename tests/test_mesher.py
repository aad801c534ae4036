"""Mesher grid units: bound-aware weight splatting.

The sequence config's ``meshing_bounding_box`` (reference
analysis/meshing.py:56-58) restricts the marching grid to a region of
interest so grid resolution is spent inside it; the splat and the
vertex back-mapping must agree on that bound.
"""
import jax.numpy as jnp
import numpy as np

from loner_tpu.analysis.mesher import _splat_weights_max


class TestBoundedSplat:
    def test_full_cube_default(self):
        grid = jnp.zeros((8, 8, 8), jnp.float32)
        lo = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
        hi = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        # Center of cell (4,4,4) for an 8^3 grid over [-1,1]: 0.125*[1,1,1]
        pts = jnp.array([[0.125, 0.125, 0.125]], jnp.float32)
        out = np.asarray(_splat_weights_max(grid, pts, jnp.array([0.7]), lo, hi))
        assert out[4, 4, 4] == np.float32(0.7)
        assert out.sum() == np.float32(0.7)

    def test_restricted_bound_uses_full_resolution(self):
        # Bound = the [0,1]^3 octant: a point at its center must land in
        # the grid's center cell, not in the cube-global upper octant.
        grid = jnp.zeros((8, 8, 8), jnp.float32)
        lo = jnp.array([0.0, 0.0, 0.0], jnp.float32)
        hi = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        pts = jnp.array([[0.5625, 0.5625, 0.5625]], jnp.float32)  # cell 4 center
        out = np.asarray(_splat_weights_max(grid, pts, jnp.array([1.0]), lo, hi))
        assert out[4, 4, 4] == np.float32(1.0)

    def test_outside_bound_clamps_to_boundary_cells(self):
        grid = jnp.zeros((4, 4, 4), jnp.float32)
        lo = jnp.array([0.0, 0.0, 0.0], jnp.float32)
        hi = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        pts = jnp.array(
            [[-0.5, 0.5, 0.5], [1.5, 0.5, 0.5]], jnp.float32
        )
        out = np.asarray(
            _splat_weights_max(grid, pts, jnp.array([0.3, 0.4]), lo, hi)
        )
        assert out[0, 2, 2] == np.float32(0.3)
        assert out[3, 2, 2] == np.float32(0.4)

    def test_max_reduce_keeps_strongest(self):
        grid = jnp.zeros((4, 4, 4), jnp.float32)
        lo = jnp.array([-1.0, -1.0, -1.0], jnp.float32)
        hi = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        p = jnp.array([[0.1, 0.1, 0.1], [0.1, 0.1, 0.1]], jnp.float32)
        out = np.asarray(
            _splat_weights_max(grid, p, jnp.array([0.2, 0.9]), lo, hi)
        )
        assert out.max() == np.float32(0.9)


class TestVertexBackMapping:
    def test_bound_roundtrip(self):
        # get_mesh maps grid indices -> bound coords -> world meters;
        # splat maps world-cube coords -> grid indices. A cell-center
        # point must round-trip to (approximately) itself.
        res = 16
        bound = np.array([[-0.5, 0.0, -1.0], [0.5, 1.0, 0.0]], np.float32)
        ijk = np.array([3, 7, 12], np.float64)
        # get_mesh's vertex mapping (cube coords):
        vert = bound[0] + (ijk / res) * (bound[1] - bound[0])
        # Splat index recovery for the same point nudged to the cell center:
        center = bound[0] + ((ijk + 0.5) / res) * (bound[1] - bound[0])
        frac = (center - bound[0]) / (bound[1] - bound[0])
        back = np.floor(frac * res).astype(int)
        np.testing.assert_array_equal(back, ijk.astype(int))
        assert np.all(vert >= bound[0] - 1e-6) and np.all(vert <= bound[1] + 1e-6)
