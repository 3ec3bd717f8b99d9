"""Row-split with a custom (Pallas-style) halo-consuming local_fn."""

import numpy as np
import pytest

import jax.numpy as jnp

from hipe_tpu.models import pipelines as plib
from hipe_tpu.ops import reference as oracle
from hipe_tpu.parallel import mesh as meshlib
from hipe_tpu.parallel.row_split import make_row_split_fn
from hipe_tpu.utils.images import checker_image


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("name,radius_fn", [
    ("blur3", lambda b: oracle.gaussian_blur_int_oracle(b, 1)),
    ("blur5", lambda b: oracle.gaussian_blur_int_oracle(b, 2)),
])
def test_halo_local_fn_interpret_pallas(n_shards, name, radius_fn):
    pipe = plib.PIPELINES[name]
    mesh = meshlib.make_mesh(n_shards, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh,
        local_fn=pipe.nhwc_halo_fn(use_pallas=True, interpret=True),
        radius=pipe.radius,
    )
    batch = np.stack([checker_image(64, 128, 3, seed=s) for s in range(2)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = np.stack([radius_fn(b) for b in batch])
    np.testing.assert_array_equal(got, want)


def test_halo_local_fn_xla_path():
    pipe = plib.PIPELINES["blur3"]
    mesh = meshlib.make_mesh(8, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh, local_fn=pipe.nhwc_halo_fn(use_pallas=False), radius=pipe.radius
    )
    batch = np.stack([checker_image(32, 48, 3, seed=7)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = np.stack([oracle.gaussian_blur_int_oracle(batch[0])])
    np.testing.assert_array_equal(got, want)


def test_halo_fn_rejects_chains():
    # A chain via the valid-mode halo path would be inexact at global image
    # edges; the API must refuse rather than silently return wrong pixels.
    with pytest.raises(ValueError, match="nhwc_clamp_fn"):
        plib.PIPELINES["chain"].nhwc_halo_fn(use_pallas=False)


def _chain_oracle(batch, names):
    from hipe_tpu.ops import blur as xblur

    return np.asarray(xblur.filter_chain(jnp.asarray(batch), names))


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_clamp_fn_chain_exact_at_global_edges(n_shards, use_pallas):
    """Chains via the window path are oracle-exact everywhere, edges incl.

    (ADVICE.md round 1: the old single-halo local_fn path diverged at rows
    0 and H-1 for a 2-shard gaussian3+sharpen run.)
    """
    pipe = plib.PIPELINES["chain"]  # gaussian3 + sharpen + edge, radius 3
    mesh = meshlib.make_mesh(n_shards, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh,
        local_fn=pipe.nhwc_clamp_fn(use_pallas=use_pallas,
                                    interpret=use_pallas),
        radius=pipe.radius,
        local_clamp=True,
    )
    batch = np.stack([checker_image(64, 128, 3, seed=s) for s in range(2)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = _chain_oracle(batch, pipe.filters)
    np.testing.assert_array_equal(got, want)


def test_clamp_fn_chain_thin_shards():
    # own rows == 2*radius + 2 (8 rows/shard, chain radius 3): the window
    # borrows 2R = 6 rows from a single neighbor — the tightest legal case.
    pipe = plib.PIPELINES["chain"]
    mesh = meshlib.make_mesh(4, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh,
        local_fn=pipe.nhwc_clamp_fn(use_pallas=False),
        radius=pipe.radius,
        local_clamp=True,
    )
    batch = np.stack([checker_image(32, 48, 3, seed=11)])
    got = np.asarray(fn(jnp.asarray(batch)))
    np.testing.assert_array_equal(got, _chain_oracle(batch, pipe.filters))


def test_clamp_fn_single_filter_exact():
    pipe = plib.PIPELINES["blur5"]
    mesh = meshlib.make_mesh(4, axis=meshlib.ROW_AXIS)
    fn = make_row_split_fn(
        mesh,
        local_fn=pipe.nhwc_clamp_fn(use_pallas=True, interpret=True),
        radius=pipe.radius,
        local_clamp=True,
    )
    batch = np.stack([checker_image(64, 128, 3, seed=3)])
    got = np.asarray(fn(jnp.asarray(batch)))
    want = np.stack([oracle.gaussian_blur_int_oracle(batch[0], 2)])
    np.testing.assert_array_equal(got, want)
