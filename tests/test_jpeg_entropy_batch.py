"""Batched native entropy coding: read/write_coefficients_batch.

The round-3 serving-path fix: entropy decode/encode run on a GIL-free
native pthread pool (hipe_jpeg_read_coefs_batch / write_coefs_batch in
jpeg_codec.cpp) instead of per-image ctypes calls from a Python thread
pool. These tests pin batch == per-image equivalence, error handling for
corrupt payloads inside a batch, and the rc=3 exact-size retry contract.
"""

import ctypes

import numpy as np
import pytest

from hipe_tpu.io_ import jpeg as jio

pytestmark = pytest.mark.skipif(
    not jio.native_available(), reason="native codec unavailable"
)


def _images(n, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def _coefs_equal(a: jio.JpegCoefficients, b: jio.JpegCoefficients):
    assert (a.width, a.height, a.max_h, a.max_v, a.progressive) == (
        b.width, b.height, b.max_h, b.max_v, b.progressive
    )
    assert len(a.components) == len(b.components)
    for x, y in zip(a.components, b.components):
        assert (x.h_samp, x.v_samp) == (y.h_samp, y.v_samp)
        np.testing.assert_array_equal(x.coefs, y.coefs)
        np.testing.assert_array_equal(x.qtable, y.qtable)


def test_read_batch_matches_single_mixed_geometries():
    """One batch spanning 4:2:0 / 4:4:4 / 4:2:2, odd dims, grayscale."""
    imgs = _images(5)
    payloads = [
        jio.encode_bytes_opts(imgs[0], quality=85, subsampling="420"),
        jio.encode_bytes_opts(imgs[1], quality=70, subsampling="444"),
        jio.encode_bytes_opts(imgs[2], quality=95, subsampling="422"),
        jio.encode_bytes_opts(
            np.ascontiguousarray(imgs[3][:47, :63]), quality=85,
            subsampling="420",
        ),
        jio.encode_bytes_opts(imgs[4][:, :, :1], quality=85),
    ]
    got = jio.read_coefficients_batch(payloads)
    assert len(got) == len(payloads)
    for p, g in zip(payloads, got):
        _coefs_equal(jio.read_coefficients(p), g)


def test_read_batch_progressive():
    img = _images(1)[0]
    p = jio.encode_bytes_opts(img, quality=85, progressive=True)
    (got,) = jio.read_coefficients_batch([p])
    _coefs_equal(jio.read_coefficients(p), got)
    assert got.progressive


def test_read_batch_single_thread_matches():
    payloads = [jio.encode_bytes_opts(im, quality=80) for im in _images(3)]
    a = jio.read_coefficients_batch(payloads, num_threads=1)
    b = jio.read_coefficients_batch(payloads, num_threads=8)
    for x, y in zip(a, b):
        _coefs_equal(x, y)


def test_read_batch_corrupt_payload_names_index():
    payloads = [jio.encode_bytes_opts(im, quality=80) for im in _images(4)]
    payloads.insert(2, b"\xff\xd8not a jpeg")
    with pytest.raises(ValueError, match=r"indices \[2\]"):
        jio.read_coefficients_batch(payloads)


def test_read_batch_truncated_stream_names_index():
    """Header scans fine, entropy data truncated -> read-phase failure."""
    payloads = [jio.encode_bytes_opts(im, quality=80) for im in _images(3)]
    payloads[1] = payloads[1][: len(payloads[1]) // 2]
    try:
        out = jio.read_coefficients_batch(payloads)
    except ValueError as e:
        assert "[1]" in str(e)
    else:
        # libjpeg may recover a truncated stream with a warning; then the
        # batch must still match the single-image reader exactly.
        for p, g in zip(payloads, out):
            _coefs_equal(jio.read_coefficients(p), g)


def test_read_batch_empty():
    assert jio.read_coefficients_batch([]) == []


@pytest.mark.parametrize("subsampling", ["420", "444", "422"])
def test_write_batch_matches_single(subsampling):
    imgs = _images(6, seed=3)
    payloads = [
        jio.encode_bytes_opts(im, quality=85, subsampling=subsampling)
        for im in imgs
    ]
    cos = jio.read_coefficients_batch(payloads)
    ncomps = len(cos[0].components)
    stacked = [
        np.stack([co.components[ci].coefs for co in cos])
        for ci in range(ncomps)
    ]
    got = jio.write_coefficients_batch(
        stacked, 64, 48, quality=85, subsampling=subsampling
    )
    for i, co in enumerate(cos):
        want = jio.write_coefficients(
            [c.coefs for c in co.components], 64, 48, quality=85,
            subsampling=subsampling,
        )
        assert got[i] == want


def test_write_batch_shape_validation():
    imgs = _images(2)
    p = [jio.encode_bytes_opts(im, quality=85, subsampling="420")
         for im in imgs]
    cos = jio.read_coefficients_batch(p)
    stacked = [
        np.stack([co.components[ci].coefs for co in cos]) for ci in range(3)
    ]
    # Luma geometry coincides between 4:2:0 and 4:4:4; chroma (component 1)
    # is the first mismatch.
    with pytest.raises(ValueError, match="component 1"):
        jio.write_coefficients_batch(stacked, 64, 48, subsampling="444")


def test_encode_rc3_reports_needed_size_and_retry():
    """C contract: rc=3 puts the required capacity in out_len; the Python
    wrappers retry at that exact size (the ADVICE capacity-ceiling fix)."""
    lib = jio._load()
    img = np.ascontiguousarray(_images(1)[0])
    out = np.empty(16, dtype=np.uint8)
    out_len = ctypes.c_size_t()
    rc = lib.hipe_jpeg_encode(
        jio._as_u8p(img), 64, 48, 3, 90, jio._as_u8p(out), 16, out_len
    )
    assert rc == 3
    assert out_len.value == len(jio.encode_bytes(img, 90))


def test_run_encode_retry_path():
    """_run_encode retries once at the reported size and succeeds."""
    lib = jio._load()
    img = np.ascontiguousarray(_images(1)[0])

    def call(out, cap, out_len):
        return lib.hipe_jpeg_encode(
            jio._as_u8p(img), 64, 48, 3, 90, out, cap, out_len
        )

    assert jio._run_encode(call, 1) == jio.encode_bytes(img, 90)


def test_write_batch_overflow_retries_at_exact_size():
    """An image whose stream exceeds the per-image slot (noise at q100
    4:4:4 entropy-codes above 1 byte/px) takes the rc=3 retry inside the
    batch and still matches the single-image writer byte-for-byte."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    payload = jio.encode_bytes_opts(img, quality=100, subsampling="444")
    co = jio.read_coefficients(payload)
    stacked = [c.coefs[None] for c in co.components]
    (got,) = jio.write_coefficients_batch(
        stacked, 512, 512, quality=100, subsampling="444"
    )
    want = jio.write_coefficients(
        [c.coefs for c in co.components], 512, 512, quality=100,
        subsampling="444",
    )
    assert got == want
    assert len(got) > 512 * 512 + 65536  # really overflowed the slot
