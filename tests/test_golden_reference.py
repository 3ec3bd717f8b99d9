"""Cross-implementation golden check against the reference's own artifact.

`/root/reference/split_output.jpg` is the committed output of the reference's
Approach-2 OpenCL run on `image_320x240.jpg` (saved via CImg at
`split_image_blur.c:548-553`). Decoding it and comparing against this
framework's blur of the same input validates the whole numerics chain
(decode -> 3x3 blur with clamp borders and truncating store) against the
*actual* reference implementation, not just our oracle. The only noise is
the JPEG round-trip of the saved artifact (measured: max 5, mean 0.42)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.io_.jpeg import decode_file
from hipe_tpu.ops import blur as xblur
from hipe_tpu.ops import reference as oracle

INPUT = "/root/reference/image_320x240.jpg"
GOLDEN = "/root/reference/split_output.jpg"


@pytest.fixture(scope="module")
def pair():
    return decode_file(INPUT), decode_file(GOLDEN)


def test_oracle_matches_reference_golden(pair):
    inp, golden = pair
    ours = oracle.gaussian_blur_int_oracle(inp)
    d = np.abs(ours.astype(int) - golden.astype(int))
    assert d.max() <= 8, d.max()  # JPEG round-trip noise only
    assert d.mean() <= 1.0, d.mean()


def test_xla_blur_matches_reference_golden(pair):
    inp, golden = pair
    ours = np.asarray(xblur.gaussian_blur3x3(jnp.asarray(inp)))
    d = np.abs(ours.astype(int) - golden.astype(int))
    assert d.max() <= 8 and d.mean() <= 1.0


def test_pallas_blur_matches_reference_golden(pair):
    from hipe_tpu.ops import pallas_blur
    from hipe_tpu.utils.images import hwc_to_planar, planar_to_hwc

    inp, golden = pair
    planes = jnp.asarray(hwc_to_planar(inp[None]))
    ours = planar_to_hwc(
        np.asarray(
            pallas_blur.gaussian_blur_planar_pallas(planes, 1, interpret=True)
        ),
        3,
    )[0]
    d = np.abs(ours.astype(int) - golden.astype(int))
    assert d.max() <= 8 and d.mean() <= 1.0
