"""XLA-path filters vs the NumPy oracle: bit-exact across layouts/radii."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.ops import blur as xblur
from hipe_tpu.ops import reference as oracle
from hipe_tpu.utils.images import checker_image, hwc_to_planar, planar_to_hwc


@pytest.mark.parametrize("radius", [1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(32, 32, 3), (31, 45, 3), (240, 320, 3)])
def test_gaussian_blur_hwc_bit_exact(radius, shape):
    img = checker_image(*shape, seed=radius)
    got = np.asarray(xblur.gaussian_blur(jnp.asarray(img), radius))
    np.testing.assert_array_equal(got, oracle.gaussian_blur_int_oracle(img, radius))


def test_gaussian_blur_batched_nhwc():
    batch = np.stack([checker_image(24, 40, 3, seed=s) for s in range(4)])
    got = np.asarray(xblur.gaussian_blur3x3(jnp.asarray(batch)))
    want = np.stack([oracle.gaussian_blur_int_oracle(b) for b in batch])
    np.testing.assert_array_equal(got, want)


def test_gaussian_blur_planar_layout():
    batch = np.stack([checker_image(32, 32, 3, seed=s) for s in range(2)])
    planes = hwc_to_planar(batch)
    got = planar_to_hwc(
        np.asarray(xblur.gaussian_blur_planar(jnp.asarray(planes))), 3
    )
    want = np.stack([oracle.gaussian_blur_int_oracle(b) for b in batch])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("radius", [1, 2])
def test_halo_mode_matches_padded_interior(radius):
    """h_pad=False over a slab with halo rows == unsplit blur interior rows."""
    img = checker_image(40, 32, 3, seed=7)
    want = oracle.gaussian_blur_int_oracle(img, radius)
    lo, hi = 10, 30  # output rows we want
    slab = img[lo - radius : hi + radius]  # with halo
    got = np.asarray(
        xblur.gaussian_blur(jnp.asarray(slab), radius, h_pad=False)
    )
    np.testing.assert_array_equal(got, want[lo:hi])


def test_sharpen_and_edge_match_oracle():
    img = checker_image(30, 30, 3, seed=9)
    np.testing.assert_array_equal(
        np.asarray(xblur.sharpen3x3(jnp.asarray(img))),
        oracle.sharpen3x3_oracle(img),
    )
    np.testing.assert_array_equal(
        np.asarray(xblur.sobel_edge(jnp.asarray(img))),
        oracle.sobel_edge_oracle(img),
    )


def test_filter_chain_matches_sequential_oracle():
    img = checker_image(30, 30, 3, seed=11)
    got = np.asarray(
        xblur.filter_chain(jnp.asarray(img), ("gaussian3", "sharpen", "edge"))
    )
    want = oracle.sobel_edge_oracle(
        oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(img))
    )
    np.testing.assert_array_equal(got, want)


def test_filter_chain_halo_mode():
    img = checker_image(48, 32, 3, seed=13)
    names = ("gaussian3", "sharpen", "edge")
    r = xblur.chain_radius(names)
    want = oracle.sobel_edge_oracle(
        oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(img))
    )
    lo, hi = 12, 36
    slab = img[lo - r : hi + r]
    got = np.asarray(
        xblur.filter_chain(jnp.asarray(slab), names, h_pad=False)
    )
    np.testing.assert_array_equal(got, want[lo:hi])


def test_median_matches_oracle_all_layouts():
    img = checker_image(27, 34, 3, seed=17)
    want = oracle.median3x3_oracle(img)
    np.testing.assert_array_equal(
        np.asarray(xblur.median3x3(jnp.asarray(img))), want)
    rows = jnp.asarray(img[None].reshape(1, 27, 34 * 3))
    got_rows = np.asarray(xblur.median3x3_rows(rows, 3)).reshape(27, 34, 3)
    np.testing.assert_array_equal(got_rows, want)
    # valid (halo) mode: interior of the padded image
    got_valid = np.asarray(
        xblur.median3x3(jnp.asarray(img), h_pad=False))
    np.testing.assert_array_equal(got_valid, want[1:-1])


def test_denoise_chain_matches_sequential_oracle():
    img = checker_image(24, 24, 3, seed=19)
    got = np.asarray(
        xblur.filter_chain(jnp.asarray(img), ("median", "gaussian3")))
    want = oracle.gaussian_blur_int_oracle(oracle.median3x3_oracle(img))
    np.testing.assert_array_equal(got, want)


def test_rank_filters_match_oracle_and_pil_all_layouts():
    # erode/dilate (3x3 min/max): NumPy oracle is ground truth, and PIL's
    # MinFilter/MaxFilter are an independent oracle — PIL rank filters
    # replicate the border row/column before ranking, the same
    # clamp-to-edge rule as the reference kernel, so equality holds
    # everywhere, borders included.
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (27, 34, 3)).astype(np.uint8)
    cases = (
        ("erode", oracle.erode3x3_oracle, ImageFilter.MinFilter(3)),
        ("dilate", oracle.dilate3x3_oracle, ImageFilter.MaxFilter(3)),
    )
    for name, ofn, pil_filter in cases:
        want = ofn(img)
        pil = np.stack(
            [np.asarray(Image.fromarray(img[:, :, c]).filter(pil_filter))
             for c in range(3)], axis=-1)
        np.testing.assert_array_equal(want, pil, err_msg=f"{name} vs PIL")
        got = np.asarray(xblur.FILTERS[name](jnp.asarray(img)))
        np.testing.assert_array_equal(got, want, err_msg=f"{name} hwc")
        rows = jnp.asarray(img[None].reshape(1, 27, 34 * 3))
        got_rows = np.asarray(
            xblur.ROWS_FILTERS[name](rows, 3)).reshape(27, 34, 3)
        np.testing.assert_array_equal(got_rows, want, err_msg=f"{name} rows")
        got_valid = np.asarray(
            xblur.FILTERS[name](jnp.asarray(img), h_pad=False))
        np.testing.assert_array_equal(got_valid, want[1:-1],
                                      err_msg=f"{name} halo")


def test_morphology_open_close_match_sequential_oracle():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (24, 30, 3)).astype(np.uint8)
    got_open = np.asarray(
        xblur.filter_chain(jnp.asarray(img), ("erode", "dilate")))
    np.testing.assert_array_equal(
        got_open, oracle.dilate3x3_oracle(oracle.erode3x3_oracle(img)))
    got_close = np.asarray(
        xblur.filter_chain(jnp.asarray(img), ("dilate", "erode")))
    np.testing.assert_array_equal(
        got_close, oracle.erode3x3_oracle(oracle.dilate3x3_oracle(img)))
