"""Approach 2, TPU-native: H-axis SPMD sharding with ICI halo exchange.

The reference splits every image's rows between two devices with a 1-row halo
realized as overlapping host-buffer reads (`/root/reference/
split_image_blur.c:144-173,516,537`); seam exactness comes from computing the
halo rows on both devices and discarding them at read-back. On TPU the halo
moves over ICI instead: each shard `lax.ppermute`s its boundary rows to its
neighbors inside one jitted SPMD program, blurs its halo-padded slab in
"valid" mode, and keeps exactly its own output rows — bit-identical to the
unsplit blur for every split point (the reference's seam-correctness
property, SURVEY.md §3.2), generalized from 2 devices/halo=1 to N devices /
halo=radius (5x5, 9x9, filter chains).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hipe_tpu.ops import blur as xblur
from hipe_tpu.parallel.mesh import ROW_AXIS


def exchange_halo(
    x: jax.Array,
    radius: int,
    axis_name: str,
    h_axis: int = 1,
) -> jax.Array:
    """Halo-pad a local row shard: neighbors' rows over ICI, edge clamp at ends.

    `x` is the per-device block of an H-sharded array (inside shard_map).
    Returns `x` extended by `radius` rows on each side of `h_axis`:
    interior shards receive their neighbors' boundary rows via
    `lax.ppermute`; the first/last shard replicate their own edge row,
    matching the reference kernel's clamp-to-edge semantics
    (`gaussian_kernel.cl:56-57`).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    h = h_axis

    top_rows = lax.slice_in_dim(x, 0, radius, axis=h)
    nloc = x.shape[h]
    bot_rows = lax.slice_in_dim(x, nloc - radius, nloc, axis=h)

    if n > 1:
        # Shift down: shard i sends its bottom rows to shard i+1 (its halo-top).
        from_prev = lax.ppermute(
            bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        # Shift up: shard i sends its top rows to shard i-1 (its halo-bottom).
        from_next = lax.ppermute(
            top_rows, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_prev = jnp.zeros_like(bot_rows)
        from_next = jnp.zeros_like(top_rows)

    # Global edges: clamp-to-edge == replicate own first/last row.
    first = lax.slice_in_dim(x, 0, 1, axis=h)
    last = lax.slice_in_dim(x, nloc - 1, nloc, axis=h)
    edge_top = jnp.concatenate([first] * radius, axis=h) if radius > 1 else first
    edge_bot = jnp.concatenate([last] * radius, axis=h) if radius > 1 else last

    top = jnp.where(idx == 0, edge_top, from_prev)
    bot = jnp.where(idx == n - 1, edge_bot, from_next)
    return jnp.concatenate([top, x, bot], axis=h)


def make_row_split_fn(
    mesh: Mesh,
    names: Sequence[str] = ("gaussian3",),
    *,
    axis_name: str = ROW_AXIS,
    batch_axis: str | None = None,
    local_fn: Callable | None = None,
    radius: int | None = None,
    channels: int | None = None,
) -> Callable[[jax.Array], jax.Array]:
    """Build the jitted row-split pipeline over `mesh`.

    Input/output: (B, H, W, C) uint8 — or, with `channels=C`, interleaved
    rows (B, H, W*C), the recommended TPU device layout (4-D NHWC uint8
    tiles pad C to 128 lanes on TPU) — H sharded over `axis_name` (and B
    over `batch_axis` if given: DP x SP on a 2-D mesh). `names` is a filter
    chain from :data:`hipe_tpu.ops.blur.FILTERS`; alternatively pass
    `local_fn` (a halo-consuming fn of signature block->block, e.g. a
    Pallas kernel wrapper) together with its `radius`.
    """
    names = tuple(names)

    if local_fn is None and channels is not None:
        # Rows-layout chain with per-stage halo exchange.
        def local(block: jax.Array) -> jax.Array:
            for name in names:
                r_i = xblur.FILTER_RADIUS[name]
                padded = exchange_halo(block, r_i, axis_name, h_axis=1)
                block = xblur.ROWS_FILTERS[name](
                    padded, channels, h_pad=False
                )
            return block

    elif local_fn is not None:
        # Single custom stage (e.g. a Pallas kernel): one halo exchange of
        # its radius, then the valid-mode kernel.
        assert radius is not None, "local_fn requires an explicit radius"

        def local(block: jax.Array) -> jax.Array:
            return local_fn(exchange_halo(block, radius, axis_name, h_axis=1))

    else:
        # Chains exchange halos per stage: at global image edges each stage
        # must clamp its *own input* (the previous stage's output), so a
        # single summed-radius exchange of the raw input would be wrong
        # at the first/last shard. Interior seams would be exact either
        # way; per-stage exchange keeps edges exact too, at the cost of
        # one tiny ppermute per stage.
        def local(block: jax.Array) -> jax.Array:
            for name in names:
                r_i = xblur.FILTER_RADIUS[name]
                padded = exchange_halo(block, r_i, axis_name, h_axis=1)
                block = xblur.FILTERS[name](
                    padded, h_axis=1, w_axis=2, h_pad=False
                )
            return block

    pspec_in = P(batch_axis, axis_name)
    # check_vma=False: Pallas calls inside the shard body don't carry
    # varying-mesh-axes metadata on their output avals.
    shard_fn = jax.shard_map(
        local, mesh=mesh, in_specs=pspec_in, out_specs=pspec_in,
        check_vma=False,
    )

    @jax.jit
    def step(x: jax.Array) -> jax.Array:
        x = lax.with_sharding_constraint(x, NamedSharding(mesh, pspec_in))
        return shard_fn(x)

    return step


def row_split_blur(
    x: jax.Array,
    mesh: Mesh,
    names: Sequence[str] = ("gaussian3",),
    **kw,
) -> jax.Array:
    """One-shot convenience wrapper around :func:`make_row_split_fn`."""
    return make_row_split_fn(mesh, names, **kw)(x)
