"""Doc tables must match the committed benchmark JSONs (no drift).

Round 2's verdict found FINDINGS.md/README quoting superseded captures.
The measured tables in FINDINGS.md now live in autogen blocks rendered
from the JSONs (benchmarks/render_tables.py); this test fails the suite
whenever the committed markdown and the committed JSON disagree, and
cross-checks README's canonical codec numbers against the same JSON.
"""

import importlib.util
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _render_tables():
    spec = importlib.util.spec_from_file_location(
        "render_tables", os.path.join(ROOT, "benchmarks", "render_tables.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_findings_tables_match_committed_jsons():
    rt = _render_tables()
    with open(rt.FINDINGS) as f:
        text = f.read()
    assert rt.apply(text) == text, (
        "FINDINGS.md autogen tables drift from the committed JSONs; "
        "run: python benchmarks/render_tables.py"
    )


def test_readme_codec_numbers_match_json():
    """README's device-codec claims must track device_decode_v5e.json."""
    with open(os.path.join(ROOT, "benchmarks",
                           "device_decode_v5e.json")) as f:
        d = json.load(f)
    with open(os.path.join(ROOT, "README.md")) as f:
        readme = f.read()

    def quoted(pattern):
        m = re.search(pattern, readme)
        assert m, f"README no longer contains pattern {pattern!r}"
        return float(m.group(1))

    # "NNk img/s on-device vs M.Mk for the full host codec"
    dev_decode = quoted(r"(\d+(?:\.\d+)?)k img/s on-device vs") * 1e3
    host_full = quoted(r"on-device vs (\d+(?:\.\d+)?)k for the full host "
                       r"codec") * 1e3
    dev_encode = quoted(r"device\s+encode (\d+(?:\.\d+)?)k img/s") * 1e3
    transcode = quoted(r"full transcode (\d+(?:\.\d+)?)k img/s") * 1e3

    for claimed, measured in [
        (dev_decode, d["device_decode_img_s"]),
        (host_full, d["host_full_decode_img_s"]),
        (dev_encode, d["device_encode_img_s"]),
        (transcode, d["device_transcode_blur3_img_s"]),
    ]:
        assert claimed == pytest.approx(measured, rel=0.03), (
            f"README quotes {claimed:.0f} img/s but the committed JSON "
            f"measures {measured:.0f}; update README (one canonical "
            "number per metric, sourced from the JSON)"
        )


def _read(path):
    with open(os.path.join(ROOT, path)) as f:
        return f.read()


def _latest_bench():
    import glob

    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    assert paths, "no BENCH_r*.json captures committed"
    with open(paths[-1]) as f:
        return json.load(f)["parsed"]


def test_readme_headline_brackets_latest_bench():
    """README's flagship row must bracket the latest committed capture.

    Round 3's verdict: prose perf numbers sat outside the measured band
    because only the tables were drift-tested. The quoted median must
    track the latest BENCH_r*.json median and the quoted session band
    must contain every session — and stay narrow enough that it can't be
    gamed wide.
    """
    readme = _read("README.md")
    m = re.search(
        r"\*\*(\d+(?:\.\d+)?)M img/s\*\* median \(256x256; sessions "
        r"(\d+(?:\.\d+)?)-(\d+(?:\.\d+)?)M",
        readme,
    )
    assert m, "README flagship row pattern changed; update this test"
    med, lo, hi = (float(g) for g in m.groups())
    bench = _latest_bench()
    sessions = sorted(s / 1e6 for s in bench["sessions_img_s"])
    measured_med = sessions[len(sessions) // 2]
    assert med == pytest.approx(measured_med, rel=0.02), (
        f"README median {med}M vs measured {measured_med:.3f}M "
        "(latest BENCH_r*.json); re-source the prose from the capture"
    )
    assert lo <= sessions[0] + 5e-3 and sessions[-1] <= hi + 5e-3, (
        f"README band {lo}-{hi}M does not bracket measured sessions "
        f"{sessions[0]:.3f}-{sessions[-1]:.3f}M"
    )
    # Anti-gaming: the quoted band may never be wider than the measured
    # spread (+5k slack) — but a capture with a legitimately wide spread
    # (round 4: one tunnel-noisy 1.59M session next to 1.95M) must still
    # be quotable honestly, so the cap is data-driven, floored at 0.2M.
    spread = sessions[-1] - sessions[0]
    assert hi - lo <= max(0.2, spread + 5e-3), (
        "README session band suspiciously wide")


def test_findings_flagship_band_brackets_captures():
    """FINDINGS' flagship band must bracket the committed medians."""
    text = _read(os.path.join("benchmarks", "FINDINGS.md"))
    m = re.search(
        r"capture:\s*\*\*(\d+(?:\.\d+)?)-(\d+(?:\.\d+)?)M img/s\*\*", text
    )
    assert m, "FINDINGS flagship band pattern changed; update this test"
    lo, hi = float(m.group(1)), float(m.group(2))
    with open(os.path.join(ROOT, "benchmarks",
                           "flagship_sessions.json")) as f:
        fs = json.load(f)
    candidates = [fs["median"] / 1e6, _latest_bench()["value"] / 1e6]
    assert lo <= min(candidates) + 5e-3 and max(candidates) <= hi + 5e-3, (
        f"FINDINGS band {lo}-{hi}M does not bracket committed medians "
        f"{candidates}"
    )
    # Anti-gaming: same data-driven cap as the README session-band test —
    # the quoted band may never be wider than the committed medians' own
    # spread (+5k slack), floored at 0.2M so a tight capture still allows
    # a round number.
    spread = max(candidates) - min(candidates)
    assert hi - lo <= max(0.2, spread + 5e-3), (
        "FINDINGS flagship band suspiciously wide")


def test_readme_test_count_matches_collection(request):
    """README's quoted test count must track the real collection size.

    Only meaningful when the whole suite is collected (partial runs —
    `pytest tests/test_doc_tables.py` — skip; the full-suite run is the
    committed gate).
    """
    items = request.session.items
    if len(items) < 400:
        pytest.skip("partial collection; run the full suite to enforce")
    readme = _read("README.md")
    m = re.search(r"`tests/` — (\d+) tests", readme)
    assert m, "README test-count pattern changed; update this test"
    assert int(m.group(1)) == len(items), (
        f"README claims {m.group(1)} tests; the suite collects "
        f"{len(items)} — update the README row"
    )
