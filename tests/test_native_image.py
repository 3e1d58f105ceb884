"""Native C++ image decode+crop+resize vs the PIL path.

The native worker (data/native/image_decode.cpp) must stay
distribution-equivalent to PIL: same libjpeg decode, PIL-style antialiased
bilinear.  Tolerances cover the fixed-point (PIL) vs float (native) resample
difference.
"""
import io

import numpy as np
import pytest
from PIL import Image

from prcv2025reid_tpu.data import native_image


def _jpeg_bytes(w=97, h=123, quality=92, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish content so JPEG compression noise stays moderate
    base = rng.normal(size=(h // 8 + 1, w // 8 + 1, 3))
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    img = ((img - img.min()) / (np.ptp(img) + 1e-9) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(
    not native_image.available(), reason="g++/libjpeg unavailable"
)


@needs_native
def test_decode_info():
    data = _jpeg_bytes(64, 48)
    assert native_image.decode_info(data) == (64, 48)
    assert native_image.decode_info(b"not a jpeg") is None


@needs_native
def test_decode_matches_pil_exactly_at_native_size():
    """Same libjpeg: the raw decode must agree almost exactly (identity
    resize keeps the resampler out of the comparison)."""
    data = _jpeg_bytes(64, 48)
    native = native_image.decode_crop_resize(data, (48, 64))
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert native.shape == pil.shape
    assert np.mean(np.abs(native.astype(int) - pil.astype(int))) < 0.5


@needs_native
@pytest.mark.parametrize("out", [(224, 224), (32, 56)])
def test_resize_matches_pil(out):
    data = _jpeg_bytes(97, 123)
    native = native_image.decode_crop_resize(data, out)
    pil_img = Image.open(io.BytesIO(data)).convert("RGB")
    pil = np.asarray(pil_img.resize((out[1], out[0]), Image.BILINEAR))
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert diff.mean() < 1.0, diff.mean()
    assert diff.max() <= 30  # isolated fixed-point-vs-float disagreements


@needs_native
def test_crop_resize_matches_pil_box():
    data = _jpeg_bytes(120, 90)
    box = (13, 7, 64, 60)  # left, top, w, h
    native = native_image.decode_crop_resize(data, (32, 32), box)
    pil_img = Image.open(io.BytesIO(data)).convert("RGB")
    pil = np.asarray(
        pil_img.resize((32, 32), Image.BILINEAR,
                       box=(box[0], box[1], box[0] + box[2], box[1] + box[3]))
    )
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert diff.mean() < 1.0, diff.mean()


@needs_native
def test_transform_native_matches_pil_eval_path(tmp_path):
    from prcv2025reid_tpu.data.augment import ImageTransform

    p = tmp_path / "img.jpg"
    p.write_bytes(_jpeg_bytes(150, 200))
    tf = ImageTransform(image_size=64, train=False)
    a = tf.load_and_transform(str(p), None, use_native=True)
    b = tf.load_and_transform(str(p), None, use_native=False)
    assert a.shape == b.shape == (64, 64, 3)
    assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 1.0


@needs_native
def test_transform_native_train_rng_stream_matches():
    """Same seed => same crop/flip/jitter/erase decisions in both paths, and
    the outputs agree up to resampler rounding."""
    import tempfile, os

    from prcv2025reid_tpu.data.augment import ImageTransform

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "img.jpg")
        with open(p, "wb") as f:
            f.write(_jpeg_bytes(150, 200, seed=3))
        tf = ImageTransform(image_size=64, train=True)
        a = tf.load_and_transform(str(p), np.random.default_rng(7), use_native=True)
        b = tf.load_and_transform(str(p), np.random.default_rng(7), use_native=False)
        assert a.shape == b.shape
        # identical draws => identical geometry; only resampler rounding and
        # erase-region fill (identical) may differ
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 2.0


def test_pil_fallback_on_non_jpeg(tmp_path):
    """PNG payloads silently take the PIL path even with use_native=True."""
    from prcv2025reid_tpu.data.augment import ImageTransform

    p = tmp_path / "img.png"
    arr = (np.arange(40 * 30 * 3) % 255).astype(np.uint8).reshape(30, 40, 3)
    Image.fromarray(arr).save(p)
    tf = ImageTransform(image_size=32, train=False)
    a = tf.load_and_transform(str(p), None, use_native=True)
    b = tf.load_and_transform(str(p), None, use_native=False)
    np.testing.assert_array_equal(a, b)
