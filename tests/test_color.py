"""Color (saturation) — PIL ImageEnhance.Color bit-exact: per-pixel
fp32 blend with the pixel's own Pillow luma, run directly in-graph."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipe_tpu.ops import equalize as eq


def _pil_color(img: np.ndarray, factor: float) -> np.ndarray:
    from PIL import Image, ImageEnhance

    return np.asarray(
        ImageEnhance.Color(Image.fromarray(img)).enhance(factor))


@pytest.mark.parametrize("factor", [0.0, 0.3, 0.75, 1.0, 1.5, 2.2])
def test_oracle_and_jax_match_pil(factor):
    rng = np.random.default_rng(int(factor * 100) + 3)
    img = rng.integers(0, 256, (36, 44, 3), np.uint8)
    want = _pil_color(img, factor)
    np.testing.assert_array_equal(eq.color_oracle(img, factor), want)
    got = np.asarray(eq.color_nhwc(jnp.asarray(img[None]), factor=factor))[0]
    np.testing.assert_array_equal(got, want)
    jf = jax.jit(lambda x: eq.color_nhwc(x, factor=factor))
    np.testing.assert_array_equal(np.asarray(jf(jnp.asarray(img[None])))[0],
                                  want)


def test_layouts_and_grayscale_identity():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (2, 32, 40, 3), np.uint8)
    want = np.stack([_pil_color(b, 1.8) for b in img])
    rows = jnp.asarray(img.reshape(2, 32, 120))
    got_r = np.asarray(eq.color_rows(rows, 3, factor=1.8))
    np.testing.assert_array_equal(got_r.reshape(img.shape), want)
    planes = jnp.asarray(img.transpose(0, 3, 1, 2).reshape(6, 32, 40))
    got_p = np.asarray(eq.color_planar(planes, 3, factor=1.8))
    np.testing.assert_array_equal(
        got_p, want.transpose(0, 3, 1, 2).reshape(6, 32, 40))
    # L-mode: PIL blends the image with itself -> identity.
    gray = rng.integers(0, 256, (3, 24, 20), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(eq.color_planar(jnp.asarray(gray), 1, factor=1.8)), gray)


def test_pipeline_registry_and_row_split():
    from hipe_tpu.models.pipelines import PIPELINES, GlobalStatsPipeline
    from hipe_tpu.parallel import mesh as meshlib
    from hipe_tpu.parallel.row_split import make_color_row_split_fn

    assert "color" in PIPELINES
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (2, 64, 40, 3), np.uint8)
    np.testing.assert_array_equal(
        np.asarray(PIPELINES["color"](jnp.asarray(img))), img)  # factor 1.0
    pipe = GlobalStatsPipeline("color", factor=0.4)
    want = np.stack([_pil_color(b, 0.4) for b in img])
    np.testing.assert_array_equal(np.asarray(pipe(jnp.asarray(img))), want)
    with pytest.raises(ValueError, match="color factor"):
        GlobalStatsPipeline("color", factor=-1)
    with pytest.raises(ValueError, match="make_color_row_split_fn"):
        pipe.radius
    mesh = meshlib.make_mesh(8, axis=meshlib.ROW_AXIS)
    fn = make_color_row_split_fn(mesh, factor=0.4)
    np.testing.assert_array_equal(np.asarray(fn(jnp.asarray(img))), want)


def test_serving_pipeline_color():
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.models.pipelines import GlobalStatsPipeline
    from hipe_tpu.runtime.serve import ServingPipeline

    rng = np.random.default_rng(13)
    payloads = [
        jpeg.encode_bytes(rng.integers(0, 256, (32, 48, 3), np.uint8), 90)
        for _ in range(2)
    ]
    pipe = GlobalStatsPipeline("color", factor=1.6)
    px = ServingPipeline(pipe, use_pallas=False).process_batch(
        payloads, encode=False)
    for got, payload in zip(px, payloads):
        np.testing.assert_array_equal(
            got, eq.color_oracle(jpeg.decode_bytes(payload), 1.6))
    ref = ServingPipeline(pipe, use_pallas=False).process_batch(payloads)
    got = ServingPipeline(
        pipe, use_pallas=False, decode_on_device=True,
        encode_on_device=True).process_batch(payloads)
    assert got == ref
