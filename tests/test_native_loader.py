"""Tests for the native (C++/libjpeg/OpenMP) data-loader core.

The library auto-builds on first import when g++ is present
(simlingo_tpu/native/__init__.py); every test skips cleanly when the build
is impossible so the suite stays green on toolchain-less machines.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simlingo_tpu import native  # noqa: E402
from simlingo_tpu.data import imageio  # noqa: E402
from simlingo_tpu.data.image_pipe import (bottom_crop,  # noqa: E402
                                          preprocess_numpy)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader unavailable (no g++?)")


@pytest.fixture(scope="module")
def jpeg_frame():
    """A structured 1024x512 camera-like frame and its JPEG encoding."""
    rng = np.random.RandomState(0)
    img = np.zeros((512, 1024, 3), np.uint8)
    for _ in range(30):
        x, y = rng.randint(0, 900), rng.randint(0, 400)
        color = tuple(int(v) for v in rng.randint(0, 255, 3))
        cv2.rectangle(img, (x, y), (x + 100, y + 100), color, -1)
    img = cv2.GaussianBlur(img, (5, 5), 2)
    ok, buf = cv2.imencode(".jpg", img[:, :, ::-1])
    assert ok
    blob = buf.tobytes()
    decoded = cv2.imdecode(np.frombuffer(blob, np.uint8),
                           cv2.IMREAD_COLOR)[:, :, ::-1]
    return blob, decoded


def test_jpeg_dims(jpeg_frame):
    blob, _ = jpeg_frame
    assert native.jpeg_dims(blob) == (512, 1024)


def test_decode_matches_cv2_exactly(jpeg_frame):
    """Both sides use libjpeg's ISLOW IDCT: decode must be bit-exact."""
    blob, ref = jpeg_frame
    out = native.decode_jpeg_batch([blob] * 3, 512, 1024)
    assert out.shape == (3, 512, 1024, 3)
    for i in range(3):
        np.testing.assert_array_equal(out[i], ref)


def test_preprocess_matches_cv2_path(jpeg_frame):
    """decode+crop+bicubic+normalize+tile vs image_pipe.preprocess_numpy.

    cv2's uint8 INTER_CUBIC rounds to uint8 between resize and normalize;
    the native path stays float, so parity is to ~1 uint8 LSB
    (1/255/std ~ 0.0175 normalized).
    """
    blob, ref = jpeg_frame
    want = preprocess_numpy(ref)
    got = native.preprocess_jpeg_batch([blob], 512, 1024)
    assert got.shape == (1,) + want.shape
    np.testing.assert_allclose(got[0], want, atol=0.02)


def test_decode_crop_batch(jpeg_frame):
    blob, ref = jpeg_frame
    out = native.decode_crop_batch([blob] * 2, 512, 1024)
    want = bottom_crop(ref)
    assert out.shape == (2,) + want.shape
    np.testing.assert_array_equal(out[0], want)
    np.testing.assert_array_equal(out[1], want)


def test_corrupt_jpeg_raises_not_crashes(jpeg_frame):
    blob, _ = jpeg_frame
    # truncated stream: libjpeg tolerates it (pads the missing scanlines) --
    # same behavior as cv2; it must complete without crashing the process
    bad = blob[: len(blob) // 2]
    out = native.decode_jpeg_batch([bad], 512, 1024)
    assert out.shape == (1, 512, 1024, 3)
    # unparseable garbage: must surface as a Python error, not an abort
    garbage = b"\xff\xd8\xff" + b"\x00" * 100
    with pytest.raises(ValueError):
        native.decode_jpeg_batch([garbage], 512, 1024)


def test_wrong_geometry_rejected(jpeg_frame):
    blob, _ = jpeg_frame
    with pytest.raises(ValueError):
        native.decode_jpeg_batch([blob], 448, 448)


def test_imageio_load_rgb(tmp_path, jpeg_frame):
    blob, ref = jpeg_frame
    p = str(tmp_path / "frame.jpg")
    with open(p, "wb") as f:
        f.write(blob)
    got = imageio.load_rgb(p)
    np.testing.assert_array_equal(got, ref)
    # forced-fallback path agrees
    os.environ["SIMLINGO_NATIVE"] = "0"
    try:
        np.testing.assert_array_equal(imageio.load_rgb(p), ref)
    finally:
        os.environ.pop("SIMLINGO_NATIVE")


def test_imageio_preprocessed(tmp_path, jpeg_frame):
    blob, ref = jpeg_frame
    p = str(tmp_path / "frame.jpg")
    with open(p, "wb") as f:
        f.write(blob)
    got = imageio.load_rgb_preprocessed(p)
    want = preprocess_numpy(ref)
    assert got is not None
    np.testing.assert_allclose(got, want, atol=0.02)
    os.environ["SIMLINGO_NATIVE"] = "0"
    try:
        assert imageio.load_rgb_preprocessed(p) is None
    finally:
        os.environ.pop("SIMLINGO_NATIVE")
