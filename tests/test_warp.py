"""Tests for the depth-warp / flow-visualization helpers
(reference analysis/render_utils.py:8-104 analog)."""
import numpy as np

from loner_tpu.analysis.warp import depth_to_warp, vis_flow


def pinhole_K(f=100.0, W=64, H=48):
    return np.array([[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1.0]])


def plane_range_map(K, W, H, Z):
    """Ray-range depth map of a fronto-parallel plane at optical depth Z."""
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    xz = (uu - K[0, 2]) / K[0, 0]
    yz = (vv - K[1, 2]) / K[1, 1]
    return Z * np.sqrt(1.0 + xz**2 + yz**2)


class TestDepthToWarp:
    def test_identity_zero_warp(self):
        W, H, Z = 64, 48, 5.0
        K = pinhole_K(W=W, H=H)
        d = plane_range_map(K, W, H, Z)
        warp, mask = depth_to_warp(d, d, K, np.eye(4), K)
        assert warp.shape == (H, W, 2) and mask.shape == (H, W, 1)
        np.testing.assert_allclose(warp, 0.0, atol=1e-9)
        assert mask.all()

    def test_pure_translation_closed_form(self):
        # Camera 2 at +tx along cam1's x axis, fronto-parallel plane at Z:
        # u2 - u1 = -fx * tx / Z for every pixel, v unchanged.
        W, H, Z, tx, f = 64, 48, 5.0, 0.25, 100.0
        K = pinhole_K(f=f, W=W, H=H)
        d1 = plane_range_map(K, W, H, Z)
        T12 = np.eye(4)
        T12[0, 3] = -tx  # cam1 points expressed in cam2 = p1 - [tx,0,0]
        # cam2 sees the same plane at the same optical depth
        warp, mask = depth_to_warp(d1, d1, K, T12, K)
        expected_du = -f * tx / Z
        np.testing.assert_allclose(warp[..., 0], expected_du, atol=1e-6)
        np.testing.assert_allclose(warp[..., 1], 0.0, atol=1e-6)
        # pixels warping out of frame are masked; interior ones visible
        u = np.arange(W) + expected_du
        assert mask[H // 2, u >= 1, 0].all()
        assert not mask[H // 2, u <= -1, 0].any()

    def test_holes_and_occlusion(self):
        W, H, Z = 32, 24, 4.0
        K = pinhole_K(W=W, H=H)
        d1 = plane_range_map(K, W, H, Z)
        d1[0, 0] = np.inf  # hole in the source map
        d2 = plane_range_map(K, W, H, Z)
        d2[:, : W // 2] = plane_range_map(K, W, H, Z / 2)[:, : W // 2]  # occluder
        warp, mask = depth_to_warp(d1, d2, K, np.eye(4), K)
        assert warp[0, 0, 0] == 0.0 and not mask[0, 0, 0]
        # left half: cam2 sees a nearer surface -> cam1's plane is occluded
        assert not mask[H // 2, : W // 2 - 1, 0].any()
        assert mask[H // 2, W // 2 + 1 :, 0].all()


class TestVisFlow:
    def test_shape_and_range(self):
        rng = np.random.default_rng(0)
        flow = rng.normal(0, 2, (20, 30, 2))
        img = vis_flow(flow)
        assert img.shape == (20, 30, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_direction_maps_to_distinct_hues(self):
        # +x flow -> hue 0 (red-ish), +y -> hue 120deg (green-ish)
        flow = np.zeros((2, 2, 2))
        flow[0, 0] = [1, 0]
        flow[1, 1] = [0, 1]
        img = vis_flow(flow, scale=1.0)
        assert img[0, 0, 0] == 1.0 and img[0, 0, 1] < 0.5  # red dominant
        assert img[1, 1, 1] == 1.0 and img[1, 1, 0] < 0.6  # green dominant
        # zero flow -> white (saturation 0)
        np.testing.assert_allclose(img[0, 1], 1.0)
