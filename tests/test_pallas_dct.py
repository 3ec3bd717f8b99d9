"""Fused Pallas DCT kernels (interpret mode) vs the XLA plane graphs.

ops/pallas_dct.py runs dequant+IDCT (decode) and fDCT+quantize (encode)
with all pass intermediates VMEM-resident; the arithmetic is the same
traced functions as the XLA path, so outputs must be bit-identical.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.ops import jpeg_decode as jd
from hipe_tpu.ops import jpeg_encode as je
from hipe_tpu.ops import pallas_dct as pd


@pytest.mark.parametrize("shape", [(5, 7), (4, 16), (1, 1)])
def test_dequant_idct_matches_xla(shape):
    rng = np.random.default_rng(0)
    hb, wb = shape
    q = rng.integers(1, 255, 64).astype(np.uint16)
    coefs = rng.integers(-2048, 2048, (2, hb, wb, 64)).astype(np.int16)
    want = jd._idct_planes_core(jd._dequant_planes(jnp.asarray(coefs), q))
    got = pd.dequant_idct_planes_pallas(
        jnp.asarray(coefs), q, interpret=True, block_b=2
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w).reshape(2, hb * wb)
        )


def test_fdct_quantize_matches_xla():
    rng = np.random.default_rng(1)
    q = rng.integers(1, 255, 64).astype(np.uint16)
    img = rng.integers(0, 256, (3, 40, 56)).astype(np.uint8)
    want = je.fdct_quantize(jnp.asarray(img, jnp.int32), q)
    got = je.fdct_quantize(jnp.asarray(img, jnp.int32), q,
                           pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_decode_planes_pallas_idct_path():
    # Through the public decoder: h2v2 color image, odd dims.
    from hipe_tpu.io_ import jpeg

    if not jpeg.native_available():  # pragma: no cover
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
    co = jpeg.read_coefficients(
        jpeg.encode_bytes_opts(img, quality=85, subsampling="420")
    )
    geo = jd.geometry_of(co)
    qt = [c.qtable for c in co.components]
    coefs = [jnp.asarray(np.stack([c.coefs] * 2)) for c in co.components]
    want = np.asarray(jd.decode_planes(geo, coefs, qt))
    got = np.asarray(
        jd.decode_planes(geo, coefs, qt, pallas_idct=True, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_encode_planes_pallas_path_byte_identical():
    from hipe_tpu.io_ import jpeg

    if not jpeg.native_available():  # pragma: no cover
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    geo = je.encode_geometry(24, 40, 3, "420")
    luma, chroma = jpeg.quality_tables(77)
    coefs = je.encode_planes(geo, jnp.asarray(img), [luma, chroma, chroma],
                             pallas=True, interpret=True)
    out = jpeg.write_coefficients(
        [np.asarray(c) for c in coefs], 40, 24, quality=77,
        subsampling="420",
    )
    assert out == jpeg.encode_bytes_opts(img, quality=77, subsampling="420")


def test_quantize_exact_boundaries():
    # The float-reciprocal quantizer must be exact at hard multiples.
    for qd in (8, 24, 1016, 2040):
        t = jnp.asarray(
            np.array([0, 1, qd - 1, qd, qd + 1, 7 * qd, -qd, -qd - 1,
                      65536, -65536, qd // 2, -(qd // 2)], dtype=np.int32)
        )
        got = np.asarray(pd._quantize_exact(t, qd))
        a = np.abs(np.asarray(t)) + (qd >> 1)
        want = np.where(np.asarray(t) < 0, -(a // qd), a // qd).astype(np.int16)
        np.testing.assert_array_equal(got, want)
