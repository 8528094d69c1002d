"""Camera projection tests."""

import numpy as np

from gmf_tpu.data.camera import (
    project_points, visibility_mask, best_frame_for_cloud, colors_for_points,
)


def make_K(f=100.0, W=160, H=120):
    return np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)


class TestProjection:
    def test_center_point(self):
        K = make_K()
        uv, front = project_points(np.array([[0, 0, 2.0]]), K)
        np.testing.assert_allclose(uv[0], [80, 60], atol=1e-5)
        assert front[0]

    def test_behind_camera(self):
        K = make_K()
        uv, front = project_points(np.array([[0, 0, -1.0]]), K)
        assert not front[0]

    def test_visibility_and_best_frame(self, rng):
        K = make_K()
        pts = rng.rand(200, 3).astype(np.float32)
        pts[:, 2] += 2.0  # in front of the identity camera
        w2c_good = np.eye(4)
        w2c_bad = np.eye(4)
        w2c_bad[:3, 3] = [100, 0, 0]  # way off to the side
        vis_good = visibility_mask(pts, K, w2c_good, (120, 160))
        vis_bad = visibility_mask(pts, K, w2c_bad, (120, 160))
        assert vis_good.sum() > vis_bad.sum()
        assert best_frame_for_cloud(pts, K, [w2c_bad, w2c_good],
                                    (120, 160)) == 1

    def test_occlusion_with_depth(self):
        K = make_K()
        pts = np.array([[0, 0, 2.0], [0, 0, 3.0]], np.float32)
        depth = np.full((120, 160), 2.0, np.float32)  # surface at z=2
        vis = visibility_mask(pts, K, np.eye(4), (120, 160), depth=depth)
        assert vis[0] and not vis[1]  # the z=3 point is occluded

    def test_colors(self, rng):
        K = make_K()
        img = np.zeros((120, 160, 3), np.float32)
        img[60, 80] = [1.0, 0.5, 0.25]
        colors, valid = colors_for_points(
            np.array([[0, 0, 2.0]]), img, K, np.eye(4))
        assert valid[0]
        np.testing.assert_allclose(colors[0], [1.0, 0.5, 0.25])
