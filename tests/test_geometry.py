"""Geometry utils: OBB intersection, NMS, projection, conversions."""

import numpy as np

from simlingo_tpu.utils import geometry as G


def test_frame_conversions_roundtrip():
    p = np.array([3.0, -2.0])
    t = np.array([10.0, 5.0])
    yaw = 0.7
    g = G.conversion_2d(p, t, yaw)
    back = G.inverse_conversion_2d(g, t, yaw)
    np.testing.assert_allclose(back, p, atol=1e-12)


def test_obb_intersection():
    assert G.obb_intersect([0, 0], 0.0, (2, 1), [3.5, 0], 0.0, (2, 1))
    assert not G.obb_intersect([0, 0], 0.0, (2, 1), [5.0, 0], 0.0, (2, 1))
    # rotated box slips between
    assert not G.obb_intersect([0, 0], 0.0, (2, 0.4),
                               [0, 2.0], np.pi / 2, (1.2, 0.4))
    assert G.obb_intersect([0, 0], np.pi / 4, (3, 3), [3, 3], 0.0, (1, 1))


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30.]])
    scores = np.array([0.9, 0.8, 0.7])
    keep = G.nms(boxes, scores, iou_threshold=0.5)
    assert keep == [0, 2]


def test_projection_center():
    # point straight ahead projects to the image center
    uv = G.project_points(np.array([[10.0, 0.0, 2.0]]))
    np.testing.assert_allclose(uv[0], [512, 256], atol=1.0)
    # point behind the camera is nan
    uv2 = G.project_points(np.array([[-10.0, 0.0, 2.0]]))
    assert np.isnan(uv2[0]).all()
    # point to the right lands right of center
    uv3 = G.project_points(np.array([[10.0, 3.0, 2.0]]))
    assert uv3[0, 0] > 512


def test_normalize_angle():
    assert abs(G.normalize_angle(3 * np.pi) - np.pi) < 1e-9 or \
        abs(G.normalize_angle(3 * np.pi) + np.pi) < 1e-9
    assert abs(G.normalize_angle(0.1) - 0.1) < 1e-12


def test_convert_depth_matches_reference_encoding():
    """CARLA 24-bit RGB depth -> [0,1] map (transfuser_utils.py:591-605)."""
    from simlingo_tpu.utils.geometry import convert_depth
    img = np.zeros((2, 3, 3), np.uint8)
    # pixel encoding distance d meters: code = d/1000 * (2^24 - 1)
    code = int(round(25.0 / 1000.0 * (256 ** 3 - 1)))      # 25 m
    img[0, 0] = [(code >> 16) & 255, (code >> 8) & 255, code & 255]
    code_far = int(round(500.0 / 1000.0 * (256 ** 3 - 1)))  # 500 m -> clipped
    img[1, 2] = [(code_far >> 16) & 255, (code_far >> 8) & 255, code_far & 255]
    out = convert_depth(img)
    assert out.shape == (2, 3)
    assert abs(out[0, 0] - 0.5) < 1e-3     # 25 m = 0.025 * 20
    assert out[1, 2] == 1.0                # clipped at 50 m
    assert out[0, 1] == 0.0
