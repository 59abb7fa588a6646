"""Native C++ data runtime vs the PIL path."""

import os

import numpy as np
import pytest

from matryodshka_tpu.data import images as img_lib
from matryodshka_tpu.data import native
from matryodshka_tpu.data.synthetic import erp_texture
from matryodshka_tpu.data.images import write_image


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    tex = erp_texture(96, 192, seed=3)
    path = os.path.join(str(d), "img.jpeg")
    write_image(path, tex)
    return path


def test_native_builds_and_loads(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built (no g++/libjpeg)")
    out = native.decode_resize(jpeg_file, 48, 96)
    assert out.shape == (48, 96, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_native_matches_pil(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built")
    nat = native.decode_resize(jpeg_file, 48, 96, fast=False)
    pil = img_lib.load_and_resize(jpeg_file, 48, 96, prefer_native=False)
    # PIL rounds its resize output to uint8 (quantum 1/255); the native
    # path keeps full float precision, so differences are within the
    # PIL quantization.
    assert np.abs(nat - pil).max() < 0.01
    assert np.abs(nat - pil).mean() < 1.0 / 255.0


def test_native_identity_size(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built")
    nat = native.decode_resize(jpeg_file, 96, 192, fast=False)
    pil = img_lib.load_and_resize(jpeg_file, 96, 192, prefer_native=False)
    np.testing.assert_allclose(nat, pil, atol=0.005)


def test_native_batch(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built")
    out = native.load_batch([jpeg_file] * 5, 32, 64, n_threads=4)
    assert out.shape == (5, 32, 64, 3)
    for i in range(1, 5):
        np.testing.assert_array_equal(out[0], out[i])


def test_native_missing_file_raises(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built")
    with pytest.raises(IOError):
        native.decode_resize("/nonexistent/nope.jpeg", 8, 8)


def test_native_fast_scale_close(jpeg_file):
    if not native.native_available():
        pytest.skip("libmatryio not built")
    fast = native.decode_resize(jpeg_file, 24, 48, fast=True)
    exact = native.decode_resize(jpeg_file, 24, 48, fast=False)
    # DCT-domain prefilter vs box prefilter: close but not identical
    assert np.abs(fast - exact).mean() < 0.02
