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
