"""Device-side JPEG encode: byte-identical files vs direct libjpeg encode.

ops/jpeg_encode.py computes color conversion, downsampling, forward islow
DCT and quantization on device; io_/jpeg.py write_coefficients entropy-
encodes on host (jpeg_write_coefficients, with the direct encoder's
MCU dummy-block semantics). For the same pixels/quality/subsampling the
result must equal libjpeg's own output byte for byte.
"""

import numpy as np
import pytest

from hipe_tpu.io_ import jpeg
from hipe_tpu.ops import jpeg_encode as je

if not jpeg.native_available():  # pragma: no cover
    pytest.skip("native libjpeg codec unavailable", allow_module_level=True)


def _rand(h, w, c, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, c), dtype=np.uint8
    )


def _assert_byte_identical(img, **enc):
    want = jpeg.encode_bytes_opts(img, **enc)
    got = je.encode_bytes_device(img, **enc)
    assert got == want


def test_h2v2_even_dims():
    _assert_byte_identical(_rand(16, 24, 3), quality=90, subsampling="420")


def test_h2v2_odd_dims_and_partial_blocks():
    # Odd dims: MCU dummy blocks right+bottom, chroma-domain bottom pad.
    _assert_byte_identical(_rand(33, 17, 3, seed=1), quality=75,
                           subsampling="420")


def test_h2v2_single_mcu():
    # H, W < iMCU: the bottom edge pads in the *downsampled* domain
    # (jcprepct.c expand_bottom_edge on the output buffer) — the case
    # that distinguishes it from naive full-res edge replication.
    _assert_byte_identical(_rand(8, 8, 3, seed=2), quality=50,
                           subsampling="420")


def test_h2v1_and_h1v1():
    _assert_byte_identical(_rand(14, 18, 3, seed=3), quality=85,
                           subsampling="422")
    _assert_byte_identical(_rand(9, 7, 3, seed=4), quality=92,
                           subsampling="444")


def test_h1v2_440():
    # 4:4:0: vertical-only chroma downsample (jcsample int_downsample,
    # fixed +1 bias). Odd height exercises the group-edge replication.
    _assert_byte_identical(_rand(14, 18, 3, seed=6), quality=85,
                           subsampling="440")
    _assert_byte_identical(_rand(17, 9, 3, seed=7), quality=92,
                           subsampling="440")


def test_grayscale():
    _assert_byte_identical(_rand(21, 13, 1, seed=5), quality=80)


def test_progressive():
    # Progressive changes only the entropy coding; the device-computed
    # coefficients feed jpeg_simple_progression identically.
    _assert_byte_identical(_rand(20, 28, 3, seed=9), quality=88,
                           subsampling="420", progressive=True)


def test_roundtrip_write_coefficients():
    # The native coefficient writer alone: read-back coefficients of a
    # libjpeg file re-entropy-encode to the identical file.
    img = _rand(24, 31, 3, seed=6)
    data = jpeg.encode_bytes_opts(img, quality=70, subsampling="420")
    co = jpeg.read_coefficients(data)
    out = jpeg.write_coefficients(
        [c.coefs for c in co.components], co.width, co.height,
        quality=70, subsampling="420",
    )
    assert out == data


def test_quality_tables_match_stream():
    luma, chroma = jpeg.quality_tables(66)
    data = jpeg.encode_bytes_opts(_rand(8, 8, 3, seed=7), quality=66)
    co = jpeg.read_coefficients(data)
    np.testing.assert_array_equal(co.components[0].qtable, luma)
    np.testing.assert_array_equal(co.components[1].qtable, chroma)


def test_batched_encode_planes():
    imgs = np.stack([_rand(16, 16, 3, seed=s) for s in range(3)])
    geo = je.encode_geometry(16, 16, 3, "420")
    luma, chroma = jpeg.quality_tables(90)
    coefs = je.encode_planes(geo, imgs, [luma, chroma, chroma])
    assert [np.asarray(c).shape for c in coefs] == [
        (3, 2, 2, 64), (3, 1, 1, 64), (3, 1, 1, 64)
    ]
    # Each batch element entropy-encodes to the direct encoder's bytes.
    for i in range(3):
        out = jpeg.write_coefficients(
            [np.asarray(c)[i] for c in coefs], 16, 16,
            quality=90, subsampling="420",
        )
        assert out == jpeg.encode_bytes_opts(imgs[i], quality=90,
                                             subsampling="420")


def test_decode_encode_loop_is_stable():
    # decode (device) -> encode (device) -> decode again: the second
    # decode must equal libjpeg's decode of the re-encoded file exactly.
    from hipe_tpu.ops import jpeg_decode as jd

    img = _rand(16, 16, 3, seed=8)
    data = jpeg.encode_bytes_opts(img, quality=90, subsampling="420")
    px = np.asarray(jd.decode_coefficients(jpeg.read_coefficients(data)))
    data2 = je.encode_bytes_device(px, quality=90, subsampling="420")
    assert data2 == jpeg.encode_bytes_opts(px, quality=90,
                                           subsampling="420")
    px2 = np.asarray(jd.decode_coefficients(jpeg.read_coefficients(data2)))
    np.testing.assert_array_equal(px2, jpeg.decode_bytes(data2))


@pytest.mark.parametrize("sub", ["411", "410", "311", "asym"])
def test_exotic_samplings_byte_identical(sub):
    # Generic int_downsample reproduction (fixed +numpix/2 bias,
    # truncating division; 3:1:1 exercises a non-power-of-two divisor,
    # "asym" the per-component method selection: Cb int_downsample(1,2),
    # Cr h2v2 with its alternating bias). jcsample.c start_pass_downsample
    # semantics; the host codec (apply_subsamp codes 4-7) is the oracle.
    _assert_byte_identical(_rand(32, 40, 3, seed=7), quality=85,
                           subsampling=sub)
    _assert_byte_identical(_rand(33, 29, 3, seed=8), quality=85,
                           subsampling=sub)
    _assert_byte_identical(_rand(9, 5, 3, seed=9), quality=85,
                           subsampling=sub)


def test_exotic_sampling_serving_placement():
    # encode_on_device now accepts the exotic layouts end-to-end: the
    # serving pipeline's device-encode output must match the host
    # codec's bytes for the same filtered pixels.
    from hipe_tpu.runtime.serve import ServingPipeline

    img = _rand(24, 24, 3, seed=10)
    payloads = [jpeg.encode_bytes_opts(img, quality=90,
                                       subsampling="420")] * 2
    kw = dict(quality=90, encode_subsampling="311", use_pallas=False)
    want = ServingPipeline("blur3", **kw).process_batch(payloads)
    got = ServingPipeline("blur3", encode_on_device=True,
                          **kw).process_batch(payloads)
    assert got == want
