"""Colorize — PIL ImageOps.colorize bit-exact: grayscale -> RGB through
three integer wedge LUTs, applied inside every serving placement."""

import numpy as np
import pytest

from hipe_tpu.ops import equalize as eq


def _pil_colorize(gray: np.ndarray, **kw) -> np.ndarray:
    from PIL import Image, ImageOps

    return np.asarray(ImageOps.colorize(Image.fromarray(gray), **kw))


@pytest.mark.parametrize("kw", [
    dict(black="blue", white="yellow"),
    dict(black=(10, 0, 30), white=(250, 240, 200), mid=(128, 20, 60)),
    dict(black="black", white="white", blackpoint=20, whitepoint=200),
    dict(black="#102030", white="#f0e0d0", mid="red",
         blackpoint=10, midpoint=100, whitepoint=240),
])
def test_colorize_lut_matches_pil(kw):
    rng = np.random.default_rng(sum(ord(c) for c in str(kw)) % 2**31)
    gray = rng.integers(0, 256, (24, 30), np.uint8)
    want = _pil_colorize(gray, **kw)
    lut3 = eq.colorize_lut(**kw)
    np.testing.assert_array_equal(eq.colorize_oracle(gray, lut3), want)


def test_colorize_lut_validation():
    with pytest.raises(ValueError, match="blackpoint <= whitepoint"):
        eq.colorize_lut("black", "white", blackpoint=200, whitepoint=100)
    with pytest.raises(ValueError, match="midpoint"):
        eq.colorize_lut("black", "white", mid="gray",
                        blackpoint=0, midpoint=250, whitepoint=200)


def test_serving_colorize_pixels_and_placements():
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.runtime.serve import ServingPipeline

    rng = np.random.default_rng(17)
    payloads = [
        jpeg.encode_bytes(rng.integers(0, 256, (32, 48, 3), np.uint8), 90)
        for _ in range(2)
    ]
    lut3 = eq.colorize_lut("blue", "yellow", mid=(120, 80, 40))
    sp = ServingPipeline("blur3", use_pallas=False, decode_gray=True,
                         colorize=lut3)
    px = sp.process_batch(payloads, encode=False)
    for got, payload in zip(px, payloads):
        g = jpeg.decode_bytes(payload, force_gray=True)[:, :, 0]
        want = eq.colorize_oracle(
            oracle.gaussian_blur_int_oracle(g[..., None])[..., 0], lut3)
        np.testing.assert_array_equal(got, want)
    # All encode placements emit identical (color) files.
    ref = ServingPipeline("blur3", use_pallas=False, decode_gray=True,
                          colorize=lut3).process_batch(payloads)
    for kwargs in ({"decode_on_device": True},
                   {"encode_on_device": True},
                   {"decode_on_device": True, "encode_on_device": True}):
        got = ServingPipeline(
            "blur3", use_pallas=False, decode_gray=True, colorize=lut3,
            **kwargs).process_batch(payloads)
        assert got == ref, kwargs
    out = jpeg.decode_bytes(ref[0])
    assert out.shape[-1] == 3  # colorized files are color JPEGs


def test_serving_colorize_duotone_and_errors():
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.runtime.serve import ServingPipeline

    rng = np.random.default_rng(19)
    payloads = [
        jpeg.encode_bytes(rng.integers(0, 256, (32, 48, 3), np.uint8), 90)
    ]
    lut3 = eq.colorize_lut("navy", "#ffe0a0")
    # gray_output + colorize = duotone tinting of color streams.
    out = ServingPipeline(
        "blur3", use_pallas=False, gray_output=True, colorize=lut3
    ).process_batch(payloads, encode=False)
    assert out[0].shape[-1] == 3
    # Color stage output without gray: clear error.
    with pytest.raises(ValueError, match="grayscale stage output"):
        ServingPipeline("blur3", use_pallas=False,
                        colorize=lut3).process_batch(payloads, encode=False)
    with pytest.raises(ValueError, match="\\(3, 256\\)"):
        ServingPipeline("blur3", colorize=np.zeros((2, 256), np.uint8))


def test_duotone_encoded_files_stay_color_across_placements():
    # Regression: the host-encode path used to re-gray a colorized
    # (gray_output + colorize) batch via gray_from_rgb, silently
    # discarding the wedge. Encoded duotone files must decode to the
    # colorized pixels and match across placements.
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.ops.jpeg_encode import rgb_to_gray
    import jax.numpy as jnp

    rng = np.random.default_rng(23)
    payloads = [
        jpeg.encode_bytes(rng.integers(0, 256, (32, 48, 3), np.uint8), 90)
    ]
    lut3 = eq.colorize_lut("navy", "#ffe0a0")
    from hipe_tpu.runtime.serve import ServingPipeline

    ref = ServingPipeline("blur3", use_pallas=False, gray_output=True,
                          colorize=lut3).process_batch(payloads)
    decoded = jpeg.decode_bytes(ref[0])
    assert decoded.shape[-1] == 3
    # The file holds the wedge colors, not a grayscale re-encode: the
    # expected pixels are colorize(luma(blur(rgb))).
    src = jpeg.decode_bytes(payloads[0])
    blurred = oracle.gaussian_blur_int_oracle(src)
    luma = np.asarray(rgb_to_gray(jnp.asarray(blurred[None])))[0]
    want = eq.colorize_oracle(luma, lut3)
    got_px = ServingPipeline(
        "blur3", use_pallas=False, gray_output=True, colorize=lut3
    ).process_batch(payloads, encode=False)[0]
    np.testing.assert_array_equal(got_px, want)
    # Encoded bytes must equal a direct color encode of those pixels.
    assert ref[0] == jpeg.encode_bytes(want, 90)
    for kwargs in ({"encode_on_device": True},
                   {"decode_on_device": True, "encode_on_device": True}):
        got = ServingPipeline(
            "blur3", use_pallas=False, gray_output=True, colorize=lut3,
            **kwargs).process_batch(payloads)
        assert got == ref, kwargs
