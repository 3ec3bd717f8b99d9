"""Pallas TPU kernels for the hot filter ops.

The reference's device kernel (`/root/reference/gaussian_kernel.cl:19-72`) is a
one-work-item-per-pixel OpenCL kernel. The TPU-native redesign is VMEM-tiled:
each grid step DMAs a block of whole image *planes* (one (image, channel)
plane = one (H, W) uint8 tile) from HBM into VMEM, runs the integer stencil on
the VPU, and writes the uint8 result back — Mosaic double-buffers the
block DMAs automatically, so the kernel streams at HBM bandwidth.

Layout: planar (N, H, W) uint8 where N = batch * channels. Channels are
independent in every filter (the reference loops channels independently,
`gaussian_kernel.cl:44`), so planes are the natural unit of TPU tiling —
(H, W) maps directly onto (sublane, lane) tiles, and x/y stencil shifts are
lane/sublane shifts instead of the strided interleaved-RGB indexing the
OpenCL kernel uses (`gaussian_kernel.cl:60`).

Numerics: identical to :mod:`hipe_tpu.ops.blur` — int32 accumulate,
``>> 2*shift`` truncation (bit-identical to the reference's fp32 accumulate +
truncating uint8 cast, see :mod:`hipe_tpu.ops.reference`).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipe_tpu.ops.blur import binomial_taps


def _edge_pad(x: jax.Array, axis: int, r: int) -> jax.Array:
    """Clamp-to-edge pad by r along `axis`, Mosaic-friendly (concat only)."""
    n = x.shape[axis]
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    return jnp.concatenate([first] * r + [x] + [last] * r, axis=axis)


def _conv1d(x: jax.Array, axis: int, taps: Sequence[int], pad: bool) -> jax.Array:
    r = (len(taps) - 1) // 2
    xp = _edge_pad(x, axis, r) if pad else x
    n = xp.shape[axis] - 2 * r
    acc = None
    for j, t in enumerate(taps):
        sl = lax.slice_in_dim(xp, j, j + n, axis=axis)
        term = sl if t == 1 else sl * t
        acc = term if acc is None else acc + term
    return acc


def _blur_kernel(x_ref, o_ref, *, taps: tuple, shift: int, h_pad: bool):
    x = x_ref[:].astype(jnp.int32)
    acc = _conv1d(x, axis=2, taps=taps, pad=True)  # W (lanes)
    acc = _conv1d(acc, axis=1, taps=taps, pad=h_pad)  # H (sublanes)
    o_ref[:] = (acc >> (2 * shift)).astype(jnp.uint8)


# ---- MXU-hybrid blur (the fast path) ----
#
# The VPU-only kernel above is VPU-issue-bound (~11 ops/pixel). The hybrid
# runs the W-axis pass as a banded matmul on the MXU — which is otherwise
# idle and overlaps with the VPU — leaving only the H-axis pass (rolls +
# adds) on the VPU. Measured on v5e: ~1.6-2x faster, DMA-bound.
#
# Exactness: the band matrix folds the FULL 2D normalization taps/16^r into
# the matmul weights. Every weight is tap * 2^-4r with tap <= 8 significand
# bits, so weights are exact in bf16; uint8 pixels are exact in bf16;
# products and all partial sums are multiples of 2^-4r bounded by 256, i.e.
# they carry at most 8 + 4r <= 24 significand bits — exact in the MXU's
# fp32 accumulator (and in the fp32 VPU H-pass) for r in {1, 2, 4}. The
# final value is the exact blur result; fp32->int32 truncates like the
# reference's (unsigned char) cast (gaussian_kernel.cl:70).


@functools.cache
def _band_matrix_np(w: int, radius: int, c: int = 1):
    """(W*C x W*C) banded matrix: taps/16^r with clamp folded per pixel.

    c=1 is the planar band (column j holds taps for rows clamp(j+d)); c>1 is
    the interleaved-rows band: row-major interleaved RGB (the reference's
    device layout, `heterogeneous_blur.c:128-135`) makes an image row a W*C
    vector whose x-neighbors sit at pixel stride C, so the diagonals land at
    multiples of C — same exactness argument either way.
    """
    taps, _ = binomial_taps(radius)
    scale = 1.0 / (1 << (4 * radius))
    return _band_from_taps_np(w, tuple(taps), scale, c)


def _shift_rows_clamp(t: jax.Array, d: int) -> jax.Array:
    """t shifted so out[:, i] = t[:, clamp(i - d)] along axis 1 (sublanes)."""
    if d == 0:
        return t
    k, h, w = t.shape
    rolled = pltpu.roll(t, d % h, 1)
    row = lax.broadcasted_iota(jnp.int32, (k, h, w), 1)
    if d > 0:
        edge = jnp.broadcast_to(t[:, :1, :], t.shape)
        return jnp.where(row < d, edge, rolled)
    edge = jnp.broadcast_to(t[:, -1:, :], t.shape)
    return jnp.where(row >= h + d, edge, rolled)


def _blur_mxu_kernel(x_ref, band_ref, o_ref, *, taps: tuple, h_pad: bool):
    x = x_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
    # W pass on the MXU: (k, H, W) x (W, W) banded, fp32 accumulate.
    t = lax.dot_general(
        x, band_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r = (len(taps) - 1) // 2
    if h_pad:
        acc = None
        for j, tap in enumerate(taps):
            term = _shift_rows_clamp(t, r - j)
            term = term if tap == 1 else term * float(tap)
            acc = term if acc is None else acc + term
    else:
        # Valid mode (halo rows present): plain sublane slices, no clamp.
        n = t.shape[1] - 2 * r
        acc = None
        for j, tap in enumerate(taps):
            term = lax.slice_in_dim(t, j, j + n, axis=1)
            term = term if tap == 1 else term * float(tap)
            acc = term if acc is None else acc + term
    o_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)


def _compiler_params(vmem_limit_mb: int | None):
    """Optional raised scoped-VMEM cap (Mosaic defaults to 16 MB; v5e has
    128 MB/core). Large aliased blocks need it: measured on v5e, block
    k=200 @ 96 MB streams 760 GB/s vs 637 at the default-cap k=40
    (benchmarks/probe_vmem.json)."""
    if not vmem_limit_mb:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 2**20
        )
    }


def _pick_block_planes(
    n: int, h: int, w: int, ntaps: int = 3, budget_bytes: int = 8 * 2**20
) -> int:
    """Largest divisor of n whose int32 working set fits the VMEM budget.

    The Mosaic scoped-vmem working set grows with the number of live int32
    slices, roughly linear in the tap count (measured on v5e: ~15 B/px for a
    9-tap separable pass).
    """
    per_plane = h * w * (6 + 4 * ntaps)
    cap = max(1, budget_bytes // per_plane)
    best = 1
    for k in range(1, min(n, cap) + 1):
        if n % k == 0:
            best = k
    return best


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "h_pad", "block_planes", "interpret", "path", "alias",
        "vmem_limit_mb",
    ),
)
def gaussian_blur_planar_pallas(
    x: jax.Array,
    radius: int = 1,
    *,
    h_pad: bool = True,
    block_planes: int | None = None,
    interpret: bool = False,
    path: str = "mxu",
    alias: bool = False,
    vmem_limit_mb: int | None = None,
) -> jax.Array:
    """Pallas TPU separable binomial blur over planar (N, H, W) uint8.

    radius=1 is the reference 3x3 kernel (`gaussian_kernel.cl:36-41`);
    ``h_pad=False`` assumes halo rows are present along H and returns the
    valid interior (H - 2*radius rows) — the row-split mode.

    ``path='mxu'`` (default) runs the W pass as a banded matmul on the MXU
    (bit-exact, see `_blur_mxu_kernel`); ``path='vpu'`` is the pure-VPU
    stencil kernel.

    ``alias=True`` writes the output into the input's HBM buffer
    (``input_output_aliases``): measured ~2x DMA throughput on v5e
    (benchmarks/probe_hbm.json: 288 -> 629+ GB/s) because in-place pages
    skip the write-allocate path. Semantically safe everywhere — XLA
    inserts a copy-on-write if the operand is still live — but the speedup
    (and no-copy) materializes when the input is dead after the call, e.g.
    a loop carry or a donated jit argument. Requires h_pad=True (shape-
    preserving); ignored otherwise.
    """
    assert x.dtype == jnp.uint8 and x.ndim == 3
    taps, shift = binomial_taps(radius)
    n, h, w = x.shape
    out_h = h - 2 * radius if not h_pad else h
    io_alias = {0: 0} if (alias and h_pad and not interpret) else {}
    if interpret:
        vmem_limit_mb = None  # Mosaic-only knob; meaningless in interpret
    if path == "mxu" and h % 8 != 0:
        # Mosaic lowers the batched (k,H,W)x(W,W) dot via a (k*H,W) shape
        # cast that requires sublane-aligned H. In clamp mode, pad H with
        # edge-replicated rows (bit-exact: replicated rows == clamp) and
        # trim after; halo (valid) mode falls back to the VPU stencil.
        if h_pad:
            hp = -(-h // 8) * 8
            last = lax.slice_in_dim(x, h - 1, h, axis=1)
            xp = jnp.concatenate([x] + [last] * (hp - h), axis=1)
            out = gaussian_blur_planar_pallas(
                xp, radius, h_pad=True, block_planes=block_planes,
                interpret=interpret, path="mxu", alias=alias,
                vmem_limit_mb=vmem_limit_mb,
            )
            return out[:, :h]
        path = "vpu"
    if path == "mxu":
        # Budget above the 16 MB scoped limit is fine: liveness-based reuse
        # keeps actual usage lower (interleaved k-sweep on v5e: k=20 best).
        k = block_planes or _pick_block_planes(
            n, h, w, ntaps=len(taps), budget_bytes=24 * 2**20
        )
        assert n % k == 0, (n, k)
        kernel = functools.partial(_blur_mxu_kernel, taps=taps, h_pad=h_pad)
        band = jnp.asarray(_band_matrix_np(w, radius), jnp.bfloat16)
        return pl.pallas_call(
            kernel,
            grid=(n // k,),
            in_specs=[
                pl.BlockSpec(
                    (k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (w, w), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (k, out_h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, out_h, w), jnp.uint8),
            input_output_aliases=io_alias,
            interpret=interpret,
            **_compiler_params(vmem_limit_mb),
        )(x, band)
    k = block_planes or _pick_block_planes(n, h, w, ntaps=len(taps))
    assert n % k == 0, (n, k)
    kernel = functools.partial(_blur_kernel, taps=taps, shift=shift, h_pad=h_pad)
    return pl.pallas_call(
        kernel,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec((k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (k, out_h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_h, w), jnp.uint8),
        input_output_aliases=io_alias,
        interpret=interpret,
        **_compiler_params(vmem_limit_mb),
    )(x)


def _chain_kernel(x_ref, o_ref, *, names: tuple, trim: int,
                  int16_ranks: bool = False):
    # Fused multi-filter chain: every stage stays in VMEM/registers; only the
    # uint8 input and final uint8 output touch HBM. Halo mode (trim > 0)
    # uses the same clamp-then-trim slab semantics as the MXU chain so both
    # paths are value-identical everywhere. ``int16_ranks`` runs the
    # rank-family stages' min/max networks in int16 (2 elements/VPU lane,
    # bit-exact — an autotuned execution config like the int8 MXU bands).
    from hipe_tpu.ops import blur as xblur

    rank_names = set(xblur.rank_stage_names(names)) if int16_ranks else set()
    x = x_ref[:]
    for name in names:
        if name in rank_names:
            x = xblur.rank_stage_i16(x, name, h_axis=1, w_axis=2, h_pad=True)
        else:
            x = xblur.FILTERS[name](x, h_axis=1, w_axis=2, h_pad=True)
    if trim:
        x = x[:, trim:-trim, :]
    o_ref[:] = x


def _tiled_blur_kernel(top_ref, x_ref, bot_ref, o_ref, *, taps: tuple,
                       shift: int, radius: int):
    """One H tile of a large plane, with halo rows from neighbor tiles.

    Neighbor halos arrive as extra 8-row input blocks whose index maps are
    clamped to stay in range; the first/last tile replaces them with
    edge-replicated rows (the kernel's clamp-to-edge semantics,
    gaussian_kernel.cl:56-57).
    """
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    main = x_ref[0].astype(jnp.int32)  # (tile_h, W)
    top = top_ref[0].astype(jnp.int32)[-radius:]
    bot = bot_ref[0].astype(jnp.int32)[:radius]
    edge_t = jnp.concatenate([main[:1]] * radius, axis=0)
    edge_b = jnp.concatenate([main[-1:]] * radius, axis=0)
    tpart = jnp.where(i == 0, edge_t, top)
    bpart = jnp.where(i == n_i - 1, edge_b, bot)
    padded = jnp.concatenate([tpart, main, bpart], axis=0)
    acc = _conv1d(padded, 1, taps, pad=True)  # W axis, clamp
    acc = _conv1d(acc, 0, taps, pad=False)  # H axis, valid over the halo
    o_ref[0] = (acc >> (2 * shift)).astype(jnp.uint8)


def _tiled_point_kernel(top_ref, x_ref, bot_ref, o_ref, *, name: str):
    """One H tile of a point/stencil stage (sharpen/edge/median/erode/
    dilate/registered kernels, radius 0-4), haloed by neighbor blocks.

    Same tiling scheme as `_tiled_blur_kernel`; the stage math matches
    :mod:`hipe_tpu.ops.blur` (`sharpen3x3`/`sobel_edge`) bit-for-bit.
    """
    from hipe_tpu.ops.blur import POINT_STAGES

    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    main = x_ref[0].astype(jnp.int32)  # (tile_h, W)
    if name in POINT_STAGES:
        # Radius-0 stage: per-pixel arithmetic, halo rows unused.
        o_ref[0] = POINT_STAGES[name](main).astype(jnp.uint8)
        return
    from hipe_tpu.ops.blur import FILTER_RADIUS, KERNEL_STAGES

    r = FILTER_RADIUS[name]
    top = top_ref[0].astype(jnp.int32)[-r:]
    bot = bot_ref[0].astype(jnp.int32)[:r]
    edge_t = jnp.concatenate([main[:1]] * r, axis=0)
    edge_b = jnp.concatenate([main[-1:]] * r, axis=0)
    tpart = jnp.where(i == 0, edge_t, top)
    bpart = jnp.where(i == n_i - 1, edge_b, bot)
    padded = jnp.concatenate([tpart, main, bpart], axis=0)
    xp = _edge_pad(padded, axis=1, r=r)  # W clamp
    hn = padded.shape[0] - 2 * r
    wn = xp.shape[1] - 2 * r

    def v(dy, dx):
        return lax.slice(xp, (dy, dx), (dy + hn, dx + wn))

    if name in KERNEL_STAGES:
        from hipe_tpu.ops.blur import _floordiv_exact, _kernel_acc

        spec = KERNEL_STAGES[name]
        num = 2 * _kernel_acc(v, spec["flipped"], spec["size"]) \
            + spec["scale"] * (spec["off2"] + 1)
        out = jnp.clip(_floordiv_exact(num, 2 * spec["scale"]), 0, 255)
    elif name == "sharpen":
        out = 5 * v(1, 1) - v(0, 1) - v(2, 1) - v(1, 0) - v(1, 2)
        out = jnp.clip(out, 0, 255)
    elif name == "edge":
        gx = (v(0, 2) + 2 * v(1, 2) + v(2, 2)) - (
            v(0, 0) + 2 * v(1, 0) + v(2, 0)
        )
        gy = (v(2, 0) + 2 * v(2, 1) + v(2, 2)) - (
            v(0, 0) + 2 * v(0, 1) + v(0, 2)
        )
        out = jnp.minimum(jnp.abs(gx) + jnp.abs(gy), 255)
    elif name == "median":
        from hipe_tpu.ops.blur import _median_of_9

        out = _median_of_9([v(dy, dx) for dy in range(3) for dx in range(3)])
    elif name in ("erode", "dilate"):
        red = jnp.minimum if name == "erode" else jnp.maximum
        out = functools.reduce(
            red, [v(dy, dx) for dy in range(3) for dx in range(3)]
        )
    else:
        from hipe_tpu.ops.blur import RANK_STAGES, _rank_select

        if name not in RANK_STAGES:
            raise KeyError(name)
        size, rank = RANK_STAGES[name]
        out = _rank_select(
            [v(dy, dx) for dy in range(size) for dx in range(size)], rank
        )
    o_ref[0] = out.astype(jnp.uint8)


def _tiled_vmem(
    name: str, tile_h: int, w: int
) -> tuple[int | None, int | None]:
    """(tile_h, scoped-VMEM cap MB) for one tiled stage.

    Rank stages keep all size^2 window views live at once in the odd-even
    network (sequential accumulators — blur/kernel/point stages — fit the
    16 MB default, verified on silicon at 1504x1400), so wide planes blow
    Mosaic's default cap: median5 at tile_h=128, W=1400 needs 23.3 MB
    (measured OOM). Estimate the live set, raise the cap (v5e: 128 MB/core),
    and shrink the tile — in 8-row units, preserving _tiled_call's
    sublane-aligned halo index maps — if even 110 MB wouldn't hold it.
    Returns ``(None, None)`` when even an 8-row tile exceeds the cap
    (extreme widths): the caller must route that stage to the XLA planar
    path instead of emitting a pallas_call known to VMEM-OOM.
    """
    from hipe_tpu.ops.blur import FILTER_RADIUS, RANK_STAGES

    if name not in RANK_STAGES:
        return tile_h, None
    size, _ = RANK_STAGES[name]
    if size >= 9:
        # On-silicon (2026-08-21, v5e via the remote compile helper): a
        # size-9 tiled rank kernel stalls the Mosaic compile >30 min at
        # stream widths (W=1400) under BOTH formulations — the 81-view
        # odd-even network (~6.5k ops) and the bit-serial counting
        # selection (~1.3k ops) — i.e. the blowup tracks the 81 live
        # window views, not the op count; size 7 (49 views) compiles in
        # ~6 min and runs exact. The per-stage XLA planar fallback
        # compiles in seconds and is bit-identical, so size 9 routes
        # there unconditionally on the tiled (oversized-plane) path.
        # Fused 256x256 viability is probed separately
        # (benchmarks/probe_rank79.json).
        return None, None
    r = FILTER_RADIUS[name]

    def est_mb(th: int) -> int:
        live = (size * size + 6) * (th + 2 * r + 8) * (w + 2 * r) * 4
        return -(-live * 13 // (10 * 2**20))  # x1.3 headroom

    while tile_h > 8 and est_mb(tile_h) > 110:
        tile_h = max(8, (tile_h // 2) // 8 * 8)
    mb = est_mb(tile_h)
    if mb > 110:
        return None, None
    return tile_h, None if mb <= 14 else min(110, max(24, mb))


def _tiled_call(x: jax.Array, kernel, tile_h: int, interpret: bool,
                vmem_limit_mb: int | None = None):
    """Shared pallas_call plumbing for halo-tiled large-plane kernels.

    H is edge-pad-rounded to the tile size outside the kernel — replicated
    pad rows reproduce clamp semantics exactly for a *single* stage, so the
    result is bit-identical to the unsplit op (chains run stage-by-stage,
    each with its own pad/trim, so per-stage clamping at true edges holds).
    """
    n, h, w = x.shape
    hp = -(-h // tile_h) * tile_h
    if hp != h:
        last = lax.slice_in_dim(x, h - 1, h, axis=1)
        x = jnp.concatenate([x] + [last] * (hp - h), axis=1)
    th8 = tile_h // 8
    nh8 = hp // 8
    out = pl.pallas_call(
        kernel,
        grid=(n, hp // tile_h),
        in_specs=[
            pl.BlockSpec(
                (1, 8, w),
                lambda p, i: (p, jnp.maximum(i * th8 - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, w), lambda p, i: (p, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, w),
                lambda p, i: (p, jnp.minimum((i + 1) * th8, nh8 - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w), lambda p, i: (p, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, w), jnp.uint8),
        interpret=interpret,
        **_compiler_params(None if interpret else vmem_limit_mb),
    )(x, x, x)
    return out[:, :h] if hp != h else out


@functools.partial(
    jax.jit, static_argnames=("radius", "tile_h", "interpret")
)
def gaussian_blur_planar_tiled_pallas(
    x: jax.Array,
    radius: int = 1,
    *,
    tile_h: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Blur for planes too large to fit VMEM whole (e.g. 4000x2250 frames).

    Tiles each plane along H with `radius` rows of cross-tile halo delivered
    as clamped-index 8-row neighbor blocks; W is unconstrained (pure-VPU
    stencil).
    """
    assert x.dtype == jnp.uint8 and x.ndim == 3
    assert tile_h % 8 == 0 and tile_h >= 8
    assert radius <= 8
    taps, shift = binomial_taps(radius)
    kernel = functools.partial(
        _tiled_blur_kernel, taps=taps, shift=shift, radius=radius
    )
    return _tiled_call(x, kernel, tile_h, interpret)


@functools.partial(
    jax.jit, static_argnames=("names", "tile_h", "interpret")
)
def filter_chain_planar_tiled_pallas(
    x: jax.Array,
    names: tuple,
    *,
    tile_h: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Filter chain on oversized planes: halo-tiled Pallas, stage by stage.

    Each stage runs its own tiled pass with clamp at the true image edges
    (a fused multi-stage tile pass would need per-stage clamp inside the
    halo — impossible from replicated rows), so the chain is bit-identical
    to the unsplit chain; intermediates cost one HBM round-trip per stage,
    the same as the XLA path but on the ~2x-faster Pallas streaming path.
    """
    assert x.dtype == jnp.uint8 and x.ndim == 3
    assert tile_h % 8 == 0 and tile_h >= 8
    from hipe_tpu.ops import blur as xblur

    for name in names:
        if name.startswith("gaussian"):
            x = gaussian_blur_planar_tiled_pallas(
                x, xblur.FILTER_RADIUS[name], tile_h=tile_h,
                interpret=interpret
            )
            continue
        th, vmem_mb = _tiled_vmem(name, tile_h, x.shape[2])
        if th is None:
            # Even an 8-row tile can't hold this rank stage's live set
            # under the 110 MB scoped-VMEM ceiling (extreme widths): XLA
            # planar path for this stage — same per-stage clamp semantics,
            # so the chain stays bit-identical.
            x = xblur.filter_chain(x, (name,), h_axis=-2, w_axis=-1)
            continue
        kernel = functools.partial(_tiled_point_kernel, name=name)
        x = _tiled_call(x, kernel, th, interpret, vmem_mb)
    return x


def nhwc_pallas_eligible(h: int, w: int, c: int) -> bool:
    """Whether the interleaved-layout MXU kernel applies to this geometry."""
    lane = w * c
    # H must be sublane-aligned (Mosaic batched-dot shape cast) and the
    # dense (W*C)^2 bf16 band must stay a small fraction of VMEM.
    return h % 8 == 0 and 2 * lane * lane <= 8 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=(
        "channels", "radius", "h_pad", "block_imgs", "interpret", "alias"
    ),
)
def gaussian_blur_rows_pallas(
    rows: jax.Array,
    channels: int,
    radius: int = 1,
    *,
    h_pad: bool = True,
    block_imgs: int | None = None,
    interpret: bool = False,
    alias: bool = False,
) -> jax.Array:
    """Interleaved-rows blur: (B, H, W*C) uint8 in/out, no transposes.

    The reference's device layout is interleaved RGB; this kernel keeps it,
    treating each image row as a W*C vector and running the W pass as a
    pixel-stride-C banded matmul (see `_band_matrix_np`). Serving paths
    with interleaved inputs avoid the planar relayout entirely (2 full HBM
    round-trips saved per batch) at the cost of C x the MXU FLOPs — still
    far below the MXU ceiling. NB: a 4-D NHWC uint8 device array would be
    tiled with its C axis padded to 128 lanes (~42x HBM inflation); rows
    layout is the supported channels-last device form.
    """
    assert rows.dtype == jnp.uint8 and rows.ndim == 3
    b, h, lane = rows.shape
    assert lane % channels == 0
    w = lane // channels
    assert nhwc_pallas_eligible(h, w, channels), (h, w, channels)
    taps, _ = binomial_taps(radius)
    out_h = h - 2 * radius if not h_pad else h
    k = block_imgs or _pick_block_planes(
        b, h, lane, ntaps=len(taps), budget_bytes=12 * 2**20
    )
    assert b % k == 0, (b, k)
    band = jnp.asarray(_band_matrix_np(w, radius, channels), jnp.bfloat16)
    kernel = functools.partial(_blur_mxu_kernel, taps=taps, h_pad=h_pad)
    return pl.pallas_call(
        kernel,
        grid=(b // k,),
        in_specs=[
            pl.BlockSpec(
                (k, h, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (lane, lane), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, out_h, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, lane), jnp.uint8),
        input_output_aliases=(
            {0: 0} if (alias and h_pad and not interpret) else {}
        ),
        interpret=interpret,
    )(rows, band)


def gaussian_blur_nhwc_pallas(
    x: jax.Array, radius: int = 1, **kw
) -> jax.Array:
    """(B, H, W, C) convenience wrapper around the rows kernel.

    Only use with host-side or freshly-reshaped arrays — do NOT keep 4-D
    NHWC uint8 arrays resident on TPU (42x HBM tiling inflation).
    """
    b, h, w, c = x.shape
    out = gaussian_blur_rows_pallas(x.reshape(b, h, w * c), c, radius, **kw)
    return out.reshape(b, out.shape[1], w, c)


# ---- MXU-hybrid chain stages ----
#
# Every 3x3 stage factors into a W-axis pass (a banded matmul on the MXU,
# clamp folded into the band) and an H-axis pass (rolls + adds on the VPU):
#   blur:    smooth_W (scaled)  then  smooth_H (1,2,1)
#   sharpen: 5c - (l+r) - (u+d): (l+r) = band_W(1,0,1); (u+d) int32 rolls
#   edge:    gx = smooth_H o diff_W;  gy = diff_H o smooth_W; |gx|+|gy|
# All intermediates are small exact integers (or exact multiples of 2^-4r),
# so bf16 matmul inputs + fp32 accumulation remain bit-exact (see the blur
# exactness note above; the largest value anywhere is 4080 < 2^24).
#
# Halo mode mirrors the reference's compute-then-discard slab semantics
# (`split_image_blur.c:526,537-539`): stages run in clamp mode on the full
# block and the output trims `chain_radius` garbage rows per side — exact at
# interior shard seams (and at true global edges when the halo rows are the
# engine-supplied slab overlap).


def _band_from_taps_np(w: int, taps, scale: float = 1.0, c: int = 1):
    """(W*C x W*C) band with pixel stride c (c=1 == planar)."""
    import numpy as np

    r = (len(taps) - 1) // 2
    band = np.zeros((w * c, w * c), np.float32)
    for j in range(w):
        for ch in range(c):
            col = j * c + ch
            for d, tap in enumerate(taps):
                if tap == 0:
                    continue
                i = min(max(j + d - r, 0), w - 1)
                band[i * c + ch, col] += tap * scale
    return band


def _chain_band_specs(names: tuple, w: int, c: int = 1,
                      int8: bool = False):
    """Ordered unique band matrices a fused MXU chain needs.

    ``int8=True`` builds UNSCALED integer bands (int8): v5e's MXU runs
    int8 x int8 -> int32 at twice the bf16 rate and every tap is a small
    exact integer, so the fused chain can trade the fp32-accumulate
    formulation for integer dots + a `>> 4r` normalization (the two are
    bit-identical — see the exactness note above). Blur normalization is
    NOT folded into the int8 band (entries must stay integers); the
    stage shifts after the H pass instead.
    """
    keys: list[tuple] = []
    from hipe_tpu.ops.blur import POINT_STAGES

    for name in names:
        if name.startswith("gaussian"):
            from hipe_tpu.ops.blur import FILTER_RADIUS

            keys.append(("blur", FILTER_RADIUS[name]))
        elif name == "sharpen":
            keys.append(("lr",))
        elif name == "edge":
            keys.append(("smooth",))
            keys.append(("diff",))
        elif name in POINT_STAGES:
            pass  # radius-0 point stage: pure arithmetic, no band matrix
        else:
            raise KeyError(name)
    uniq = list(dict.fromkeys(keys))
    mats = []
    for key in uniq:
        if key[0] == "blur":
            r = key[1]
            taps, _ = binomial_taps(r)
            scale = 1.0 if int8 else 1.0 / (1 << (4 * r))
            mats.append(_band_from_taps_np(w, taps, scale, c))
        elif key[0] == "lr":
            mats.append(_band_from_taps_np(w, (1, 0, 1), 1.0, c))
        elif key[0] == "smooth":
            mats.append(_band_from_taps_np(w, (1, 2, 1), 1.0, c))
        elif key[0] == "diff":
            mats.append(_band_from_taps_np(w, (-1, 0, 1), 1.0, c))
    if int8:
        import numpy as np

        for key, m in zip(uniq, mats):
            if np.abs(m).max() > 127:
                # Clamp folding can stack several taps into one edge row
                # (blur9's column 0 reaches 163) — those stages stay bf16.
                raise ValueError(
                    f"band {key} has entries beyond int8 range"
                )
        mats = [m.astype(np.int8) for m in mats]
    return uniq, mats


# Per-band-key column sums (clamp folding relocates taps within a column
# but never changes its sum): the int8 stages center inputs at -128 to fit
# int8 and add back 128 * colsum after the dot.
def _band_colsum(key: tuple) -> int:
    if key[0] == "blur":
        return 1 << (2 * key[1])
    return {"lr": 2, "smooth": 4, "diff": 0}[key[0]]


def _mxu_stage_i8(name: str, x_i32: jax.Array, bands: dict) -> jax.Array:
    """One clamp-mode chain stage on int8 MXU bands (bit-identical).

    Inputs center at -128 so [0,255] fits int8; the dot's int32 result
    adds back ``128 * colsum`` (a scalar per band — clamp folding keeps
    every column's sum equal to the tap sum). Blur stages shift by 4r
    after the integer H pass — the documented exact-integer equivalent of
    the fp32-accumulate + truncating-cast formulation.
    """
    from hipe_tpu.ops.blur import POINT_STAGES

    if name in POINT_STAGES:
        return POINT_STAGES[name](x_i32)
    xc = (x_i32 - 128).astype(jnp.int8)

    def dot8(key):
        t = lax.dot_general(
            xc, bands[key], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        cs = _band_colsum(key)
        return t + 128 * cs if cs else t

    if name.startswith("gaussian"):
        from hipe_tpu.ops.blur import FILTER_RADIUS

        r = FILTER_RADIUS[name]
        taps, _ = binomial_taps(r)
        t = dot8(("blur", r))
        return _hpass_rolls(t, taps) >> (4 * r)
    if name == "sharpen":
        lr = dot8(("lr",))
        ud = _hpass_rolls(x_i32, (1, 0, 1))
        return jnp.clip(5 * x_i32 - lr - ud, 0, 255)
    if name == "edge":
        sm = dot8(("smooth",))
        df = dot8(("diff",))
        gx = _hpass_rolls(df, (1, 2, 1))
        gy = _hpass_rolls(sm, (-1, 0, 1))
        return jnp.minimum(jnp.abs(gx) + jnp.abs(gy), 255)
    raise KeyError(name)


def _hpass_rolls(t: jax.Array, taps) -> jax.Array:
    """Clamp-mode H-axis pass: sum_d taps[d] * t[clamp(i + d - r)]."""
    r = (len(taps) - 1) // 2
    acc = None
    for j, tap in enumerate(taps):
        if tap == 0:
            continue
        term = _shift_rows_clamp(t, r - j)
        if tap != 1:
            term = term * (float(tap) if term.dtype != jnp.int32 else int(tap))
        acc = term if acc is None else acc + term
    return acc


def _mxu_stage(name: str, x_i32: jax.Array, bands: dict) -> jax.Array:
    """One clamp-mode chain stage: int32 [0,255] in, int32 [0,255] out."""
    from hipe_tpu.ops.blur import POINT_STAGES

    if name in POINT_STAGES:
        # Radius-0 point stage: same integer expression as the XLA path
        # (VPU arithmetic between the MXU band stages, stays in VMEM).
        return POINT_STAGES[name](x_i32)
    xb = x_i32.astype(jnp.bfloat16)
    if name.startswith("gaussian"):
        from hipe_tpu.ops.blur import FILTER_RADIUS

        r = FILTER_RADIUS[name]
        taps, _ = binomial_taps(r)
        t = lax.dot_general(
            xb, bands[("blur", r)], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _hpass_rolls(t, taps).astype(jnp.int32)
    if name == "sharpen":
        lr = lax.dot_general(
            xb, bands[("lr",)], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        ud = _hpass_rolls(x_i32, (1, 0, 1))
        out = 5 * x_i32 - lr - ud
        return jnp.clip(out, 0, 255)
    if name == "edge":
        sm = lax.dot_general(
            xb, bands[("smooth",)], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        df = lax.dot_general(
            xb, bands[("diff",)], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gx = _hpass_rolls(df, (1, 2, 1))
        gy = _hpass_rolls(sm, (-1, 0, 1))
        out = (jnp.abs(gx) + jnp.abs(gy)).astype(jnp.int32)
        return jnp.minimum(out, 255)
    raise KeyError(name)


def _chain_mxu_call(x3d: jax.Array, names: tuple, *, h_pad: bool, c: int,
                    block: int | None, interpret: bool,
                    alias: bool = False,
                    vmem_limit_mb: int | None = None,
                    int8_bands: bool = False) -> jax.Array:
    """Shared pallas_call builder for fused MXU chains (planar c=1 or rows).

    `x3d` is (N, H, L) uint8 with L = W*c. Halo mode (h_pad=False) runs
    clamp-mode stages and trims `chain_radius` rows per side (the
    reference's compute-then-discard slab semantics).
    ``int8_bands=True`` runs the W-pass dots as int8 x int8 -> int32
    (2x MXU rate on v5e) — bit-identical; measured by
    benchmarks/probe_chain_int8.py before any default flips.
    """
    from hipe_tpu.ops.blur import chain_radius

    if interpret:
        vmem_limit_mb = None  # Mosaic-only knob; meaningless in interpret
    n, h, lane = x3d.shape
    w = lane // c
    trim = chain_radius(names) if not h_pad else 0
    out_h = h - 2 * trim
    keys, mats = _chain_band_specs(names, w, c, int8=int8_bands)
    band_args = [
        jnp.asarray(m, jnp.int8 if int8_bands else jnp.bfloat16)
        for m in mats
    ]
    k = block or _pick_block_planes(n, h, lane, ntaps=3,
                                    budget_bytes=12 * 2**20)
    assert n % k == 0, (n, k)
    kernel = functools.partial(
        _chain_mxu_kernel, names=names, trim=trim, band_keys=tuple(keys),
        int8_bands=int8_bands,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec(
                (k, h, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [
            pl.BlockSpec(
                (lane, lane), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            for _ in band_args
        ],
        out_specs=pl.BlockSpec(
            (k, out_h, lane), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_h, lane), jnp.uint8),
        input_output_aliases=(
            {0: 0} if (alias and h_pad and not interpret) else {}
        ),
        interpret=interpret,
        **_compiler_params(vmem_limit_mb),
    )(x3d, *band_args)


@functools.partial(
    jax.jit,
    static_argnames=(
        "channels", "names", "h_pad", "block_imgs", "interpret", "alias"
    ),
)
def filter_chain_rows_pallas(
    rows: jax.Array,
    channels: int,
    names: tuple,
    *,
    h_pad: bool = True,
    block_imgs: int | None = None,
    interpret: bool = False,
    alias: bool = False,
) -> jax.Array:
    """Fused filter chain on interleaved rows (B, H, W*C) — transpose-free."""
    assert rows.dtype == jnp.uint8 and rows.ndim == 3
    b, h, lane = rows.shape
    assert lane % channels == 0
    assert nhwc_pallas_eligible(h, lane // channels, channels), rows.shape
    return _chain_mxu_call(
        rows, tuple(names), h_pad=h_pad, c=channels, block=block_imgs,
        interpret=interpret, alias=alias,
    )


def _chain_mxu_kernel(x_ref, *refs, names: tuple, trim: int,
                      band_keys: tuple, int8_bands: bool = False):
    o_ref = refs[-1]
    bands = {key: refs[i][:] for i, key in enumerate(band_keys)}
    stage = _mxu_stage_i8 if int8_bands else _mxu_stage
    x = x_ref[:].astype(jnp.int32)
    for name in names:
        x = stage(name, x, bands)
    if trim:
        x = x[:, trim:-trim, :]
    o_ref[:] = x.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "names", "h_pad", "block_planes", "interpret", "alias",
        "vmem_limit_mb", "int8_bands", "int16_ranks",
    ),
)
def filter_chain_planar_pallas(
    x: jax.Array,
    names: tuple,
    *,
    h_pad: bool = True,
    block_planes: int | None = None,
    interpret: bool = False,
    alias: bool = False,
    vmem_limit_mb: int | None = None,
    int8_bands: bool = False,
    int16_ranks: bool = False,
) -> jax.Array:
    """Fused filter chain (e.g. blur->sharpen->edge) in one VMEM round-trip.

    The XLA path re-materializes each stage's uint8 output in HBM; this
    kernel keeps intermediate stages on-chip, cutting HBM traffic to
    1 read + 1 write for the whole chain.
    """
    from hipe_tpu.ops.blur import chain_radius

    assert x.dtype == jnp.uint8 and x.ndim == 3
    n, h, w = x.shape
    out_h = h - 2 * chain_radius(names) if not h_pad else h
    from hipe_tpu.ops.blur import POINT_STAGES

    from hipe_tpu.ops.blur import rank_stage_names

    if int16_ranks and not rank_stage_names(names):
        raise ValueError(
            f"int16_ranks applies only to chains with rank-family stages "
            f"(median/erode/dilate/registered ranks); got {names}"
        )
    mxu_ok = h % 8 == 0 and all(
        nm.startswith("gaussian") or nm in ("sharpen", "edge")
        or nm in POINT_STAGES
        for nm in names
    )
    if mxu_ok:
        return _chain_mxu_call(
            x, tuple(names), h_pad=h_pad, c=1, block=block_planes,
            interpret=interpret, alias=alias, vmem_limit_mb=vmem_limit_mb,
            int8_bands=int8_bands,
        )
    if int8_bands:
        raise ValueError(
            "int8_bands applies only to MXU-eligible chains "
            f"(H % 8 == 0, band stages); got {names} at H={h}"
        )
    # Chains run stages sequentially, so peak liveness = the widest single
    # stage: 3 temps for separable/point stages, size^2 live window views
    # for rank stages (49/81 at size 7/9 — blocks must shrink accordingly).
    from hipe_tpu.ops.blur import chain_live_taps

    k = block_planes or _pick_block_planes(
        n, h, w, ntaps=chain_live_taps(names))
    assert n % k == 0, (n, k)
    kernel = functools.partial(
        _chain_kernel, names=tuple(names),
        trim=chain_radius(names) if not h_pad else 0,
        int16_ranks=int16_ranks,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec((k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (k, out_h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_h, w), jnp.uint8),
        input_output_aliases=(
            {0: 0} if (alias and h_pad and not interpret) else {}
        ),
        interpret=interpret,
        **_compiler_params(None if interpret else vmem_limit_mb),
    )(x)
