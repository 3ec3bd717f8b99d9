"""Exhaustive on-hardware verification matrix.

Runs every kernel path x geometry x mode combination on the real TPU and
asserts bit-exactness against the NumPy oracle, writing
`benchmarks/VERIFICATION.md`. Complements the CPU-mesh test suite (which
exercises the same code in interpret mode) with proof that the Mosaic-
compiled kernels are exact on silicon.

Usage: python benchmarks/verify_hw.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decode_file_4k():
    """The reference's unused 4000x2250 input.jpg, if present."""
    from hipe_tpu.io_.jpeg import decode_file

    return decode_file("/root/reference/input.jpg")


def main() -> int:
    import jax.numpy as jnp

    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hipe_tpu.models import pipelines as plib
    from hipe_tpu.ops import pallas_blur
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.utils.images import checker_image, hwc_to_planar, planar_to_hwc

    rows_out = []

    def check(label: str, got: np.ndarray, want: np.ndarray):
        err = int(np.max(np.abs(got.astype(int) - want.astype(int))))
        rows_out.append((label, got.shape, err))
        print(f"{'OK ' if err == 0 else 'ERR'} {label}: max_abs_err={err}",
              flush=True)
        return err

    geometries = [(256, 256), (240, 320), (64, 512), (120, 168)]
    total_err = 0

    for h, w in geometries:
        batch = np.stack([checker_image(h, w, 3, seed=s) for s in range(2)])
        planes = jnp.asarray(hwc_to_planar(batch))
        rows = jnp.asarray(batch.reshape(2, h, w * 3))

        for radius, tag in ((1, "blur3"), (2, "blur5"), (4, "blur9")):
            want = np.stack(
                [oracle.gaussian_blur_int_oracle(b, radius) for b in batch]
            )
            got = planar_to_hwc(
                np.asarray(
                    pallas_blur.gaussian_blur_planar_pallas(planes, radius)
                ), 3,
            )
            total_err += check(f"planar/{tag} {h}x{w}", got, want)
            if radius == 1 and pallas_blur.nhwc_pallas_eligible(h, w, 3):
                got = np.asarray(
                    pallas_blur.gaussian_blur_rows_pallas(rows, 3, 1)
                ).reshape(batch.shape)
                total_err += check(f"rows/{tag} {h}x{w}", got, want)

        want_chain = np.stack(
            [
                oracle.sobel_edge_oracle(
                    oracle.sharpen3x3_oracle(
                        oracle.gaussian_blur_int_oracle(b)
                    )
                )
                for b in batch
            ]
        )
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.filter_chain_planar_pallas(
                    planes, ("gaussian3", "sharpen", "edge")
                )
            ), 3,
        )
        total_err += check(f"planar/chain {h}x{w}", got, want_chain)

        # Nonlinear stage (median): the generic fused VPU kernel path.
        want_den = np.stack(
            [
                oracle.gaussian_blur_int_oracle(oracle.median3x3_oracle(b))
                for b in batch
            ]
        )
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.filter_chain_planar_pallas(
                    planes, ("median", "gaussian3")
                )
            ), 3,
        )
        total_err += check(f"planar/denoise {h}x{w}", got, want_den)

        # Morphology (erode -> dilate): the second nonlinear family on the
        # same generic fused VPU kernel path.
        want_open = np.stack(
            [
                oracle.dilate3x3_oracle(oracle.erode3x3_oracle(b))
                for b in batch
            ]
        )
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.filter_chain_planar_pallas(
                    planes, ("erode", "dilate")
                )
            ), 3,
        )
        total_err += check(f"planar/open {h}x{w}", got, want_open)

        # In-place (input/output-aliased) kernels: same values, and the
        # live operand must be copy-protected by XLA (planes unchanged).
        want1 = np.stack(
            [oracle.gaussian_blur_int_oracle(b, 1) for b in batch]
        )
        planes_before = np.asarray(planes)
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.gaussian_blur_planar_pallas(
                    planes, 1, alias=True
                )
            ), 3,
        )
        total_err += check(f"planar/blur3/alias {h}x{w}", got, want1)
        total_err += check(
            f"alias-copy-protect {h}x{w}", np.asarray(planes), planes_before
        )
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.filter_chain_planar_pallas(
                    planes, ("gaussian3", "sharpen", "edge"), alias=True
                )
            ), 3,
        )
        total_err += check(f"planar/chain/alias {h}x{w}", got, want_chain)

        # int8 MXU bands: the W-pass dots as centered int8 x int8 -> int32
        # matmuls (2x MXU rate on v5e) must stay bit-identical to the
        # bf16/fp32 formulation on silicon, not just in interpret mode.
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.filter_chain_planar_pallas(
                    planes, ("gaussian3", "sharpen", "edge"), alias=True,
                    int8_bands=True,
                )
            ), 3,
        )
        total_err += check(f"planar/chain/int8 {h}x{w}", got, want_chain)

    # Halo (valid) modes against split interiors
    img = checker_image(64, 256, 3, seed=7)
    for radius, tag in ((1, "blur3"), (2, "blur5")):
        want = oracle.gaussian_blur_int_oracle(img, radius)
        lo, hi = 16, 48
        slab = img[lo - radius : hi + radius]
        p = jnp.asarray(hwc_to_planar(slab[None]))
        got = planar_to_hwc(
            np.asarray(
                pallas_blur.gaussian_blur_planar_pallas(
                    p, radius, h_pad=False
                )
            ), 3,
        )[0]
        total_err += check(f"halo/{tag}", got, want[lo:hi])

    # Halo-tiled kernels (the oversized-plane path) on hardware: blur,
    # point stages, and the stage-by-stage chain — geometry forces the
    # tiled route (H*W > 2 MiB whole-plane limit).
    big = checker_image(1504, 1400, 3, seed=13)
    bp = jnp.asarray(big.transpose(2, 0, 1))
    assert plib.Pipeline.routes_tiled(1504, 1400)
    from hipe_tpu.ops.blur import PIL_PRESETS as _PRESETS

    tiled_cases = [
        ("blur3", ("gaussian3",),
         lambda b: oracle.gaussian_blur_int_oracle(b, 1)),
        ("sharpen", ("sharpen",), oracle.sharpen3x3_oracle),
        ("edge", ("edge",), oracle.sobel_edge_oracle),
        ("chain", ("gaussian3", "sharpen", "edge"),
         lambda b: oracle.sobel_edge_oracle(
             oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(b)))),
        ("median", ("median",), oracle.median3x3_oracle),
        ("erode", ("erode",), oracle.erode3x3_oracle),
        ("dilate", ("dilate",), oracle.dilate3x3_oracle),
        # Registered-kernel stages (PIL Kernel semantics, exact integer
        # round-half-up): a 3x3 and a radius-2 5x5 through the generic
        # tiled branch.
        ("pil_emboss", ("pil_emboss",),
         lambda b: oracle.kernel_oracle(b, *_PRESETS["pil_emboss"])),
        ("pil_blur", ("pil_blur",),
         lambda b: oracle.kernel_oracle(b, *_PRESETS["pil_blur"])),
        # 5x5/7x7/9x9 rank filters (odd-even transposition network) on the
        # tiled and fused paths — 7/9 exercise the widened gate's
        # liveness-aware scoped-VMEM sizing at real plane widths.
        ("median5", ("median5",),
         lambda b: oracle.rank_oracle(b, 5, 12)),
        ("median7", ("median7",),
         lambda b: oracle.rank_oracle(b, 7, 24)),
        ("median9", ("median9",),
         lambda b: oracle.rank_oracle(b, 9, 40)),
    ]
    # Lossless DCT-domain transform tensor ops on silicon: coefficient
    # grids round-trip through the device rot90 + its inverse exactly.
    from hipe_tpu.ops import jpeg_transform as jt

    rng_t = np.random.default_rng(17)
    coefs = rng_t.integers(-1024, 1024, (8, 6, 9, 64)).astype(np.int16)
    dev_c = jnp.asarray(coefs)
    once = jt._jitted("rot90")(dev_c)
    four = once
    for _ in range(3):
        four = jt._jitted("rot90")(four)
    total_err += check("transform/rot90^4", np.asarray(four), coefs)
    total_err += check(
        "transform/transpose^2",
        np.asarray(jt._jitted("transpose")(jt._jitted("transpose")(dev_c))),
        coefs)
    for tag, names, ofn in tiled_cases:
        got = np.asarray(
            pallas_blur.filter_chain_planar_tiled_pallas(bp, names)
        ).transpose(1, 2, 0)
        total_err += check(f"tiled/{tag} 1504x1400", got, ofn(big))

    # The reference's 4000x2250 asset through the pipeline dispatch (routes
    # to the tiled kernels), chain included.
    try:
        huge = decode_file_4k()
    except Exception:
        huge = None
    if huge is not None:
        hp4 = jnp.asarray(hwc_to_planar(huge[None]))
        pipe = plib.PIPELINES["chain"]
        got = planar_to_hwc(
            np.asarray(pipe.apply_planar(hp4, use_pallas=True)), 3
        )[0]
        want4 = oracle.sobel_edge_oracle(
            oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(huge))
        )
        total_err += check("tiled/chain 4000x2250 asset", got, want4)

    # Pipeline dispatch (apply_rows) on hardware for every pipeline
    batch = np.stack([checker_image(64, 128, 3, seed=s) for s in range(2)])
    rows = jnp.asarray(batch.reshape(2, 64, 128 * 3))
    oracle_fns = {
        "blur3": lambda b: oracle.gaussian_blur_int_oracle(b, 1),
        "blur5": lambda b: oracle.gaussian_blur_int_oracle(b, 2),
        "blur9": lambda b: oracle.gaussian_blur_int_oracle(b, 4),
        "sharpen": oracle.sharpen3x3_oracle,
        "edge": oracle.sobel_edge_oracle,
        "chain": lambda b: oracle.sobel_edge_oracle(
            oracle.sharpen3x3_oracle(oracle.gaussian_blur_int_oracle(b))
        ),
        "open": lambda b: oracle.dilate3x3_oracle(oracle.erode3x3_oracle(b)),
        "close": lambda b: oracle.erode3x3_oracle(oracle.dilate3x3_oracle(b)),
        "median7": lambda b: oracle.rank_oracle(b, 7, 24),
        "median9": lambda b: oracle.rank_oracle(b, 9, 40),
    }
    for name, ofn in oracle_fns.items():
        pipe = plib.PIPELINES[name]
        got = np.asarray(pipe.apply_rows(rows, 3)).reshape(batch.shape)
        want = np.stack([ofn(b) for b in batch])
        total_err += check(f"pipeline/{name} 64x128", got, want)

    # Point stages on silicon: standalone (registry pipelines) and mixed
    # into an MXU chain (point branch of _mxu_stage is VPU arithmetic
    # between band matmuls — exercise that exact composition).
    import jax.numpy as jnp2
    from hipe_tpu.ops import blur as xblur

    for name, filt in (("invert", "invert"), ("solarize", "solarize"),
                       ("posterize", "posterize4")):
        pipe = plib.PIPELINES[name]
        got = np.asarray(pipe.apply_rows(rows, 3)).reshape(batch.shape)
        want = np.asarray(
            xblur.FILTERS[filt](jnp2.asarray(batch))
        )
        total_err += check(f"pipeline/{name} 64x128", got, want)
    mixed = ("gaussian3", "solarize", "posterize4")
    got = np.asarray(
        pallas_blur.filter_chain_planar_pallas(
            jnp2.asarray(hwc_to_planar(batch)), mixed
        )
    )
    want = hwc_to_planar(np.asarray(
        xblur.filter_chain(jnp2.asarray(batch), mixed)
    ))
    total_err += check("chain/blur3+solarize+posterize4 64x128", got, want)

    # Registered-kernel stage fused with a stencil (exercises the exact
    # reciprocal-multiply division inside the Mosaic VPU chain kernel).
    kmix = ("gaussian3", "pil_emboss")
    got = np.asarray(
        pallas_blur.filter_chain_planar_pallas(
            jnp2.asarray(hwc_to_planar(batch)), kmix
        )
    )
    want = hwc_to_planar(np.asarray(
        xblur.filter_chain(jnp2.asarray(batch), kmix)
    ))
    total_err += check("chain/blur3+pil_emboss 64x128", got, want)

    # Static-LUT point stage (pruned comparison-sum) inside an MXU chain.
    xblur.register_lut_filter("hw_g22", xblur.gamma_lut(2.2))
    lmix = ("gaussian3", "hw_g22")
    got = np.asarray(
        pallas_blur.filter_chain_planar_pallas(
            jnp2.asarray(hwc_to_planar(batch)), lmix
        )
    )
    want = hwc_to_planar(np.asarray(
        xblur.filter_chain(jnp2.asarray(batch), lmix)
    ))
    total_err += check("chain/blur3+gamma2.2-lut 64x128", got, want)

    # Global-statistics pipeline on silicon: both LUT-apply formulations
    # (take-gather and the fused comparison-sum) vs the PIL-exact oracle.
    from hipe_tpu.ops import equalize as eqops

    import functools as _ft

    for op, gpipe, ofn in (
        ("equalize", plib.PIPELINES["equalize"], eqops.equalize_oracle),
        ("autocontrast", plib.PIPELINES["autocontrast"],
         eqops.autocontrast_oracle),
        ("contrast1.4", plib.GlobalStatsPipeline("contrast", factor=1.4),
         _ft.partial(eqops.contrast_oracle, factor=1.4)),
        ("color1.6", plib.GlobalStatsPipeline("color", factor=1.6),
         _ft.partial(eqops.color_oracle, factor=1.6)),
        ("sharpness1.7", plib.GlobalStatsPipeline("sharpness", factor=1.7),
         _ft.partial(eqops.sharpness_oracle, factor=1.7)),
        ("autocontrast_tone",
         plib.GlobalStatsPipeline("autocontrast", preserve_tone=True),
         _ft.partial(eqops.autocontrast_oracle, preserve_tone=True)),
        # PIL ModeFilter: truncated windows + lowest-value tie-break +
        # count>2 gate (posterized input so real modes occur everywhere).
        ("mode", plib.PIPELINES["mode"], eqops.mode_oracle),
        ("mode5", plib.PIPELINES["mode5"],
         _ft.partial(eqops.mode_oracle, size=5)),
    ):
        if op.startswith("mode"):
            # Quantize to 8 levels — full-entropy windows rarely mode.
            q_batch = (batch & 0xE0)
            q_rows = jnp2.asarray(
                q_batch.reshape(rows.shape))
            want_g = np.stack([ofn(b) for b in q_batch])
            got = np.asarray(
                gpipe.apply_rows(q_rows, 3)).reshape(batch.shape)
            total_err += check(f"pipeline/{op} 64x128", got, want_g)
            continue
        want_g = np.stack([ofn(b) for b in batch])
        for label, cmp_ in (("cmp", True), ("gather", False)):
            got = np.asarray(
                gpipe.apply_rows(rows, 3, use_pallas=cmp_)
            ).reshape(batch.shape)
            total_err += check(f"pipeline/{op}_{label} 64x128", got, want_g)

    # Device JPEG codec on silicon: decode bit-exact vs libjpeg, encode
    # byte-identical files, full transcode == host codec loop.
    from hipe_tpu.io_ import jpeg as jio
    from hipe_tpu.ops import jpeg_decode as jd
    from hipe_tpu.ops import jpeg_encode as je
    from hipe_tpu.runtime.serve import ServingPipeline

    for tag, (ch, cw, q, sub) in {
        "256x256_q90_420": (256, 256, 90, "420"),
        "33x17_q75_420": (33, 17, 75, "420"),
        "64x80_q85_422": (64, 80, 85, "422"),
        "48x56_q92_444": (48, 56, 92, "444"),
        "64x48_q88_440": (64, 48, 88, "440"),
        "33x47_q90_440": (33, 47, 90, "440"),
    }.items():
        img = checker_image(ch, cw, 3, seed=7)
        payload = jio.encode_bytes_opts(img, quality=q, subsampling=sub)
        dev = np.asarray(jd.decode_coefficients(jio.read_coefficients(payload)))
        total_err += check(f"jpeg/device_decode {tag}", dev,
                           jio.decode_bytes(payload))
        dev_file = je.encode_bytes_device(img, quality=q, subsampling=sub)
        want_file = jio.encode_bytes_opts(img, quality=q, subsampling=sub)
        byte_err = 0 if dev_file == want_file else 1
        rows_out.append((f"jpeg/device_encode {tag} (byte-identity)",
                         img.shape, byte_err))
        print(f"{'OK ' if byte_err == 0 else 'ERR'} jpeg/device_encode {tag}",
              flush=True)
        total_err += byte_err

    # Exotic sampling layouts (replication upsample / mismatched Cb/Cr):
    # device decode AND (since the generic int_downsample reproduction)
    # device encode. 410 at 1/8 is the layout that distinguishes the
    # min_DCT_scaled_size replication rule from a per-component one.
    for tag, (ch, cw, q, sub) in {
        # w=4: narrow chroma (downsampled_width <= 2) — jdsample.c
        # replicates instead of fancy-upsampling; decoded with err up
        # to 72 before the guard was mirrored on device.
        "16x4_q85_420": (16, 4, 85, "420"),
        "12x3_q85_422": (12, 3, 85, "422"),
        "41x53_q85_411": (41, 53, 85, "411"),
        "40x52_q80_410": (40, 52, 80, "410"),
        "33x49_q90_311": (33, 49, 90, "311"),
        "48x40_q85_asym": (48, 40, 85, "asym"),
    }.items():
        img = checker_image(ch, cw, 3, seed=11)
        payload = jio.encode_bytes_opts(img, quality=q, subsampling=sub)
        co = jio.read_coefficients(payload)
        dev = np.asarray(jd.decode_coefficients(co))
        total_err += check(f"jpeg/device_decode {tag}", dev,
                           jio.decode_bytes(payload))
        for den in (2, 8):
            got = np.asarray(jd.decode_coefficients_scaled(co, den))
            total_err += check(f"jpeg/device_decode {tag} 1/{den}", got,
                               jio.decode_bytes_scaled(payload, 1, den))
        # Device encode of the same exotic layout: the generic
        # int_downsample reproduction (fixed +numpix/2 bias, truncating
        # division; per-component method selection for "asym") must emit
        # byte-identical files on silicon.
        dev_file = je.encode_bytes_device(img, quality=q, subsampling=sub)
        byte_err = 0 if dev_file == payload else 1
        rows_out.append((f"jpeg/device_encode {tag} (byte-identity)",
                         img.shape, byte_err))
        print(f"{'OK ' if byte_err == 0 else 'ERR'} jpeg/device_encode {tag}",
              flush=True)
        total_err += byte_err

    # 4-component Adobe streams (CMYK transform 0 / YCCK transform 2):
    # device decode emits the same 4-channel CMYK samples libjpeg does.
    rng4 = np.random.default_rng(13)
    for tag, ycck in (("41x53_q85_cmyk", False), ("41x53_q85_ycck", True)):
        img4 = rng4.integers(0, 256, (41, 53, 4), dtype=np.uint8)
        payload = jio.encode_cmyk_bytes(img4, quality=85, ycck=ycck)
        co = jio.read_coefficients(payload)
        dev = np.asarray(jd.decode_coefficients(co))
        total_err += check(f"jpeg/device_decode {tag}", dev,
                           jio.decode_bytes(payload))
        got = np.asarray(jd.decode_coefficients_scaled(co, 2))
        total_err += check(f"jpeg/device_decode {tag} 1/2", got,
                           jio.decode_bytes_scaled(payload, 1, 2))

    tr = ServingPipeline("chain", decode_on_device=True,
                         encode_on_device=True)
    host_sp = ServingPipeline("chain")
    img = checker_image(96, 112, 3, seed=9)
    payloads = [jio.encode_bytes(img, 90)] * 3
    tr_err = 0 if tr.process_batch(payloads) == host_sp.process_batch(
        payloads) else 1
    rows_out.append(("jpeg/device_transcode chain 96x112 (byte-identity)",
                     img.shape, tr_err))
    print(f"{'OK ' if tr_err == 0 else 'ERR'} jpeg/device_transcode chain",
          flush=True)
    total_err += tr_err

    # Golden artifact cross-check (JPEG round-trip tolerance)
    from hipe_tpu.io_.jpeg import decode_file

    inp = decode_file("/root/reference/image_320x240.jpg")
    golden = decode_file("/root/reference/split_output.jpg")
    ours = planar_to_hwc(
        np.asarray(
            pallas_blur.gaussian_blur_planar_pallas(
                jnp.asarray(hwc_to_planar(inp[None])), 1
            )
        ), 3,
    )[0]
    gerr = int(np.max(np.abs(ours.astype(int) - golden.astype(int))))
    rows_out.append(("golden split_output.jpg (<=8 ok: JPEG loss)",
                     ours.shape, gerr))
    print(f"golden artifact max diff: {gerr} (JPEG round-trip tolerance 8)")

    with open("benchmarks/VERIFICATION.md", "w") as f:
        f.write("# On-hardware verification matrix (TPU v5e)\n\n")
        f.write("Mosaic-compiled kernels vs the NumPy oracle "
                "(`hipe_tpu/ops/reference.py`). Regenerate with "
                "`python benchmarks/verify_hw.py`.\n\n")
        f.write("| case | shape | max-abs err |\n|---|---|---|\n")
        for label, shape, err in rows_out:
            f.write(f"| {label} | {shape} | {err} |\n")
        ok = total_err == 0 and gerr <= 8
        f.write(f"\nResult: {'ALL EXACT' if ok else 'FAILURES PRESENT'}\n")
    print("wrote benchmarks/VERIFICATION.md")
    return 0 if total_err == 0 and gerr <= 8 else 1


if __name__ == "__main__":
    sys.exit(main())
