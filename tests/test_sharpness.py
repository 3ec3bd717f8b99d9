"""Sharpness — PIL ImageEnhance.Sharpness bit-exact (SMOOTH-degenerate
blend with PIL's kernel-filter border-copy rule; completes the
ImageEnhance quartet)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipe_tpu.ops import equalize as eq


def _pil_sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    from PIL import Image, ImageEnhance

    mode = "L" if img.ndim == 2 else "RGB"
    pim = Image.fromarray(img, mode=mode)
    return np.asarray(ImageEnhance.Sharpness(pim).enhance(factor))


@pytest.mark.parametrize("factor", [0.0, 0.4, 1.0, 1.7, 2.0])
def test_oracle_and_jax_match_pil(factor):
    rng = np.random.default_rng(int(factor * 100) + 5)
    img = rng.integers(0, 256, (36, 44, 3), np.uint8)
    want = _pil_sharpness(img, factor)
    np.testing.assert_array_equal(eq.sharpness_oracle(img, factor), want)
    got = np.asarray(
        eq.sharpness_nhwc(jnp.asarray(img[None]), factor=factor))[0]
    np.testing.assert_array_equal(got, want)
    jf = jax.jit(lambda x: eq.sharpness_nhwc(x, factor=factor))
    np.testing.assert_array_equal(
        np.asarray(jf(jnp.asarray(img[None])))[0], want)
    # Grayscale (L-mode) images take the same path per channel.
    gray = rng.integers(0, 256, (24, 30), np.uint8)
    np.testing.assert_array_equal(
        eq.sharpness_oracle(gray, factor), _pil_sharpness(gray, factor))


def test_border_rows_pass_through():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (20, 24, 3), np.uint8)
    out = np.asarray(eq.sharpness_nhwc(jnp.asarray(img[None]), factor=2.0))[0]
    np.testing.assert_array_equal(out[0], img[0])
    np.testing.assert_array_equal(out[-1], img[-1])
    np.testing.assert_array_equal(out[:, 0], img[:, 0])
    np.testing.assert_array_equal(out[:, -1], img[:, -1])
    assert not np.array_equal(out[1:-1, 1:-1], img[1:-1, 1:-1])


def test_pipeline_and_row_split_halo_mask():
    from hipe_tpu.models.pipelines import PIPELINES, GlobalStatsPipeline
    from hipe_tpu.parallel import mesh as meshlib
    from hipe_tpu.parallel.row_split import make_sharpness_row_split_fn

    assert "sharpness" in PIPELINES
    rng = np.random.default_rng(11)
    batch = np.stack(
        [rng.integers(0, 256, (64, 40, 3), np.uint8) for _ in range(2)])
    want = np.stack([_pil_sharpness(b, 1.7) for b in batch])
    pipe = GlobalStatsPipeline("sharpness", factor=1.7)
    np.testing.assert_array_equal(np.asarray(pipe(jnp.asarray(batch))), want)
    rows = jnp.asarray(batch.reshape(2, 64, 120))
    np.testing.assert_array_equal(
        np.asarray(pipe.apply_rows(rows, 3)).reshape(batch.shape), want)
    with pytest.raises(ValueError, match="make_sharpness_row_split_fn"):
        pipe.radius
    # The hybrid shard body: ppermute halo for the smooth + axis-index
    # masks so only the edge shards pass their global border row through.
    for n in (4, 8):
        mesh = meshlib.make_mesh(n, axis=meshlib.ROW_AXIS)
        fn = make_sharpness_row_split_fn(mesh, factor=1.7)
        np.testing.assert_array_equal(
            np.asarray(fn(jnp.asarray(batch))), want, err_msg=f"n={n}")


def test_serving_pipeline_sharpness():
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.models.pipelines import GlobalStatsPipeline
    from hipe_tpu.runtime.serve import ServingPipeline

    rng = np.random.default_rng(13)
    payloads = [
        jpeg.encode_bytes(rng.integers(0, 256, (32, 48, 3), np.uint8), 90)
        for _ in range(2)
    ]
    pipe = GlobalStatsPipeline("sharpness", factor=1.8)
    px = ServingPipeline(pipe, use_pallas=False).process_batch(
        payloads, encode=False)
    for got, payload in zip(px, payloads):
        np.testing.assert_array_equal(
            got, eq.sharpness_oracle(jpeg.decode_bytes(payload), 1.8))
    ref = ServingPipeline(pipe, use_pallas=False).process_batch(payloads)
    got = ServingPipeline(
        pipe, use_pallas=False, decode_on_device=True,
        encode_on_device=True).process_batch(payloads)
    assert got == ref
