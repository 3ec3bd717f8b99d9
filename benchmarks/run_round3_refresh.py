"""Serial on-silicon refresh for the round-3 additions (one command).

Runs, in order (serially — concurrent TPU processes skew timings ~2x):
  1. verify_hw.py        — bit-exactness matrix (now incl. median,
                           narrow-chroma, transform round-trips)
  2. bench.py            — flagship (persisted autotune re-verify)
  3. run_device_decode.py — device codec rates
  4. probe_transform.py  — lossless-transform stage split on device
  5. render_tables.py    — regenerate FINDINGS autogen tables

Probes the tunnel first with a hard timeout so a dead tunnel fails fast
with a clear message instead of hanging in jax.devices().

Usage: python benchmarks/run_round3_refresh.py [--with-corpus]

--with-corpus appends the ~2 h heterogeneous corpus regeneration
(run_corpus.py full grid) so the committed per_run.csv files carry the
execution-config wg_w/wg_h columns (recorded since round 3; the round-2
capture predates them and has the columns empty).
"""

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tunnel_alive(timeout_s: int = 90) -> bool:
    probe = ("import jax, numpy as np, jax.numpy as jnp; "
             "print('OK', np.asarray(jnp.arange(4)).sum())")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=timeout_s)
        return b"OK 6" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def run(cmd: list[str], timeout_s: int) -> int:
    print(f"\n=== {' '.join(cmd)} ===", flush=True)
    try:
        return subprocess.run(cmd, cwd=ROOT, timeout=timeout_s).returncode
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout_s}s: {' '.join(cmd)}")
        return 124


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-corpus", action="store_true",
                    help="also regenerate the full heterogeneous corpus "
                         "grid (~2 h through the tunnel)")
    args = ap.parse_args()
    if not tunnel_alive():
        print("TPU tunnel unreachable (probe timed out); aborting — "
              "re-run when `jax.devices()` responds.")
        return 2
    py = sys.executable
    steps = [
        ([py, "benchmarks/verify_hw.py"], 3600),
        ([py, "bench.py"], 3600),
        ([py, "benchmarks/run_device_decode.py"], 5400),
        ([py, "benchmarks/probe_transform.py"], 1800),
        # Incremental stream rows for the pipelines added since the last
        # full capture (merged into device_stream_v5e.json).
        ([py, "benchmarks/run_device_stream.py", "--cached-tune",
          "--pipelines", "blur7", "erode", "dilate", "open", "close",
          "median5", "contrast", "color", "sharpness"], 7200),
    ]
    if args.with_corpus:
        steps.append(([py, "benchmarks/run_corpus.py", "--num-images",
                       "5000", "--runs", "3", "--batch-sizes", "35", "50",
                       "100", "200", "500", "800", "1200",
                       # Match the COMMITTED corpus shape: the single-lane
                       # grid was widened to the full {35..1200} set when
                       # round 2's verdict item closed; regenerating a
                       # narrower set would leave a mixed-capture corpus.
                       "--single-lane-batches", "35", "50", "100", "200",
                       "500", "800", "1200",
                       "--out", "benchmarks/corpus_v5e_full"], 21600))
    # Tables render last so every regenerated JSON feeds them.
    steps.append(([py, "benchmarks/render_tables.py"], 300))
    failures = 0
    for cmd, t in steps:
        rc = run(cmd, t)
        if rc != 0:
            print(f"step failed rc={rc}: {' '.join(cmd)}")
            failures += 1
    print(f"\nrefresh complete, {failures} failed step(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
