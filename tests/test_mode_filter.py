"""Mode filter — PIL ImageFilter.ModeFilter bit-exact (truncated windows,
lowest-value tie-break, count>2 gate; completes the integer-exact
ImageFilter family alongside Kernel presets and the rank filters)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.ops import equalize as eq


def _pil_mode(img: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image, ImageFilter

    mode = "L" if img.ndim == 2 else "RGB"
    pim = Image.fromarray(img, mode=mode)
    return np.asarray(pim.filter(ImageFilter.ModeFilter(size)))


def _quantized(rng, shape, levels):
    """Low-entropy test images — windows with real modes everywhere."""
    step = 255 // max(1, levels - 1)
    return (rng.integers(0, levels, shape) * step).astype(np.uint8)


@pytest.mark.parametrize("size", [3, 5])
def test_oracle_and_jax_match_pil(size):
    rng = np.random.default_rng(size)
    cases = [
        _quantized(rng, (36, 44, 3), 4),       # modes everywhere
        _quantized(rng, (17, 23, 3), 2),       # binary: strong ties
        rng.integers(0, 256, (24, 30, 3), np.uint8),  # full entropy:
        # nearly every window count <= 2 -> the original-pixel gate
    ]
    for img in cases:
        want = _pil_mode(img, size)
        np.testing.assert_array_equal(eq.mode_oracle(img, size), want)
        got = np.asarray(eq.mode_nhwc(jnp.asarray(img[None]), size=size))[0]
        np.testing.assert_array_equal(got, want)
    # Grayscale (L-mode) takes the same per-band path.
    gray = _quantized(rng, (19, 27), 3)
    want = _pil_mode(gray, size)
    np.testing.assert_array_equal(eq.mode_oracle(gray, size), want)
    got = np.asarray(
        eq.mode_planar(jnp.asarray(gray[None]), size=size))[0]
    np.testing.assert_array_equal(got, want)


def test_truncated_window_differs_from_clamp():
    # A corner where clamp-replication would double-count the edge pixel
    # into a false mode: [[7, 7], [0, 0]] — truncated 3x3 window at (0,0)
    # holds {7,7,0,0} (no count>2, keep 7); clamped would hold four 7s.
    img = np.zeros((6, 8), np.uint8)
    img[0, :] = 7
    want = _pil_mode(img, 3)
    got = np.asarray(eq.mode_planar(jnp.asarray(img[None])))[0]
    np.testing.assert_array_equal(got, want)
    assert got[0, 0] == 7  # the gate, not a clamp-inflated mode


def test_tie_breaks_to_lowest_value():
    # Window with two values at equal count>2: PIL's histogram scan
    # picks the lower one.
    img = np.array(
        [[10, 10, 10],
         [200, 200, 200],
         [10, 200, 0]], np.uint8)
    want = _pil_mode(img, 3)
    got = np.asarray(eq.mode_planar(jnp.asarray(img[None])))[0]
    np.testing.assert_array_equal(got, want)
    assert got[1, 1] == 10  # 10 and 200 both x4 in the center window


@pytest.mark.parametrize("name,size", [("mode", 3), ("mode5", 5)])
def test_pipeline_and_row_split_halo_sentinel(name, size):
    from hipe_tpu.models.pipelines import PIPELINES
    from hipe_tpu.parallel import mesh as meshlib
    from hipe_tpu.parallel.row_split import make_mode_row_split_fn

    assert name in PIPELINES
    pipe = PIPELINES[name]
    rng = np.random.default_rng(21 + size)
    batch = np.stack([_quantized(rng, (64, 40, 3), 4) for _ in range(2)])
    want = np.stack([_pil_mode(b, size) for b in batch])
    np.testing.assert_array_equal(np.asarray(pipe(jnp.asarray(batch))), want)
    rows = jnp.asarray(batch.reshape(2, 64, 120))
    np.testing.assert_array_equal(
        np.asarray(pipe.apply_rows(rows, 3)).reshape(batch.shape), want)
    planes = jnp.asarray(
        batch.transpose(0, 3, 1, 2).reshape(6, 64, 40))
    got = np.asarray(pipe.apply_planar(planes)).reshape(2, 3, 64, 40)
    np.testing.assert_array_equal(got.transpose(0, 2, 3, 1), want)
    with pytest.raises(ValueError, match="make_mode"):
        pipe.radius
    # Shard body: ppermute halo rows + axis-index sentinel masks so only
    # the true first/last shard truncates its outer window rows.
    for n in (4, 8):
        mesh = meshlib.make_mesh(n, axis=meshlib.ROW_AXIS)
        fn = make_mode_row_split_fn(mesh, size=size)
        np.testing.assert_array_equal(
            np.asarray(fn(jnp.asarray(batch))), want, err_msg=f"n={n}")


def test_serving_pipeline_mode():
    from hipe_tpu.io_ import jpeg
    from hipe_tpu.models.pipelines import PIPELINES
    from hipe_tpu.runtime.serve import ServingPipeline

    rng = np.random.default_rng(33)
    payloads = [
        jpeg.encode_bytes(_quantized(rng, (32, 48, 3), 5), 90)
        for _ in range(2)
    ]
    pipe = PIPELINES["mode"]
    px = ServingPipeline(pipe, use_pallas=False).process_batch(
        payloads, encode=False)
    for got, payload in zip(px, payloads):
        np.testing.assert_array_equal(
            got, eq.mode_oracle(jpeg.decode_bytes(payload), 3))
    ref = ServingPipeline(pipe, use_pallas=False).process_batch(payloads)
    got = ServingPipeline(
        pipe, use_pallas=False, decode_on_device=True,
        encode_on_device=True).process_batch(payloads)
    assert got == ref
