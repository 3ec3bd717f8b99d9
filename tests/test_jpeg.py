"""Native JPEG codec: decode parity with PIL, roundtrip, batched decode."""

import numpy as np
import pytest

from hipe_tpu.io_ import jpeg
from hipe_tpu.utils.images import DEFAULT_IMAGE_256, DEFAULT_IMAGE_320


def test_native_codec_builds():
    assert jpeg.native_available(), "native libjpeg codec failed to build"


@pytest.mark.parametrize("path", [DEFAULT_IMAGE_256, DEFAULT_IMAGE_320])
def test_decode_matches_pil(path):
    with open(path, "rb") as f:
        data = f.read()
    got = jpeg.decode_bytes(data)
    want = jpeg._pil_decode(data)
    assert got.shape == want.shape and got.dtype == np.uint8
    # libjpeg versions may differ in IDCT rounding by at most 1 count
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_encode_decode_roundtrip_close():
    rng = np.random.default_rng(0)
    # Smooth image so JPEG loss is small
    base = rng.integers(100, 140, size=(64, 64, 3)).astype(np.uint8)
    data = jpeg.encode_bytes(base, quality=95)
    out = jpeg.decode_bytes(data)
    assert out.shape == base.shape
    assert np.mean(np.abs(out.astype(int) - base.astype(int))) < 10


def test_decode_batch_matches_single():
    with open(DEFAULT_IMAGE_256, "rb") as f:
        data = f.read()
    single = jpeg.decode_bytes(data)
    batch = jpeg.decode_batch([data] * 7, num_threads=4)
    assert batch.shape == (7,) + single.shape
    for i in range(7):
        np.testing.assert_array_equal(batch[i], single)


def test_decode_invalid_raises():
    with pytest.raises(ValueError):
        jpeg.decode_bytes(b"not a jpeg at all")
