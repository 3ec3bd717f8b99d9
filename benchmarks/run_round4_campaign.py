"""Round-4 on-silicon measurement campaign (one resilient command).

Everything round 4 still owes silicon, in order, serially (concurrent TPU
processes skew timings ~2x):

  1.  verify_hw.py           — bit-exactness matrix incl. the round-4
                               cases (int8 chain bands, exotic encode)
  2.  run_device_stream.py   — the 12 registered pipelines with no
                               committed throughput row (incremental merge)
  3.  run_device_stream.py   — chain re-sweep (int8 MXU band config is a
                               first-class autotune candidate now)
  4.  probe_chain_int8.py    — the VERDICT-requested chain probe JSON
  5.  probe_rank79.py        — rank 7/9 gate decision artifact
  6.  probe_rank_i16.py      — int16 sort networks for the rank kernels
  7.  probe_separable.py     — MXU-banded W pass for separable kernels
  8.  run_device_decode.py   — codec rates incl. round-3 placements
                               (stdout JSON -> device_decode_v5e.json)
  9.  probe_transform.py     — lossless-transform stage split
  10. run_corpus_slice.py    — heterogeneous slice: filled wg_w/wg_h +
                               median5/contrast through the real Engine
  11. bench.py x3            — flagship multi-process spread
                               (-> flagship_sessions.json)
  12. render_tables.py       — regenerate FINDINGS autogen tables (CPU)

Health gating (CLAUDE.md): the tunnel can be down for hours and the
arange probe passes while the TPU worker crash-cycles after an OOM, so
every step is gated on TWO consecutive light probes plus one REAL
chained-kernel execution (bench.backend_healthy). A step that exits 42
(poisoned JAX client: UNAVAILABLE / FAILED_PRECONDITION / worker crash)
is retried in a fresh process after re-gating; other failures are
recorded and the campaign moves on. Progress persists in
/tmp/campaign_r4_state.json so a re-run skips finished steps.

Usage: python benchmarks/run_round4_campaign.py [--state PATH] [--only NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # tunnel_alive / backend_healthy live here

MISSING_STREAM_ROWS = [
    "denoise", "erode", "dilate", "open", "close", "median5",
    "posterize", "equalize", "autocontrast", "contrast", "color",
    "sharpness",
]

PY = sys.executable


def log(msg: str) -> None:
    print(f"[campaign {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def wait_healthy(max_wait_s: float = float("inf")) -> bool:
    """Block until the chip is measurable: two consecutive light probes
    (a single OK can be a false-recovery blip) then one real chained
    kernel execution. Returns False only if max_wait_s elapses."""
    start = time.time()
    while time.time() - start < max_wait_s:
        if bench.tunnel_alive(timeout_s=90):
            time.sleep(15)
            if bench.tunnel_alive(timeout_s=90):
                log("two light probes OK; running the real-kernel gate "
                    "(~1-10 min incl. possible remote-compile stall)")
                if bench.backend_healthy(timeout_s=900):
                    log("backend healthy")
                    return True
                log("worker unhealthy (crash-cycle?); waiting 300 s")
                time.sleep(300)
                continue
            log("false-recovery blip (1 OK then fail); waiting 180 s")
        else:
            log("tunnel down; re-probing in 180 s")
        time.sleep(180)
    return False


def run_step(name: str, cmd: list[str], timeout_s: int,
             stdout_to: str | None = None, retries: int = 4) -> dict:
    for attempt in range(1, retries + 1):
        wait_healthy()
        log(f"step {name} attempt {attempt}/{retries}: {' '.join(cmd)}")
        t0 = time.time()
        try:
            r = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                               text=True, timeout=timeout_s)
        except subprocess.TimeoutExpired:
            log(f"step {name} TIMEOUT after {timeout_s}s")
            continue
        dt = time.time() - t0
        sys.stdout.write(r.stderr[-4000:] if r.stderr else "")
        if r.returncode == 0:
            if stdout_to:
                # Only replace the committed artifact on success, and only
                # with the final JSON line (logs go to stderr by contract).
                line = r.stdout.strip().splitlines()[-1]
                json.loads(line)  # validate before overwriting
                with open(os.path.join(ROOT, stdout_to), "w") as f:
                    f.write(line)
                log(f"wrote {stdout_to}")
            log(f"step {name} OK in {dt:.0f}s")
            return {"ok": True, "seconds": round(dt, 1),
                    "stdout_tail": r.stdout[-2000:]}
        poisoned = r.returncode == 42 or any(
            tag in (r.stderr or "") + (r.stdout or "")
            for tag in ("UNAVAILABLE", "FAILED_PRECONDITION",
                        "worker process crashed"))
        log(f"step {name} rc={r.returncode} poisoned={poisoned} "
            f"({dt:.0f}s); stderr tail:\n{(r.stderr or '')[-1500:]}")
        if not poisoned and attempt >= 2:
            # A deterministic failure won't heal with retries.
            return {"ok": False, "rc": r.returncode,
                    "stderr_tail": (r.stderr or "")[-3000:]}
        time.sleep(120)
    return {"ok": False, "rc": "retries-exhausted"}


def flagship_spread(state: dict, state_path: str) -> dict:
    """bench.py x3 in fresh processes -> flagship_sessions.json."""
    details = []
    for i in range(3):
        res = run_step(f"flagship-{i}", [PY, "bench.py"], timeout_s=3600)
        if not res.get("ok"):
            return {"ok": False, "why": f"flagship run {i} failed"}
        line = [ln for ln in res["stdout_tail"].splitlines()
                if ln.startswith("{")][-1]
        d = json.loads(line)
        if d.get("value") is None or d.get("max_abs_err", 1) != 0:
            return {"ok": False, "why": f"flagship run {i} bad: {line[:300]}"}
        details.append({"sessions": d["sessions_img_s"],
                        "config": d["chosen_config"],
                        "max_abs_err": d["max_abs_err"]})
        state[f"flagship-{i}-detail"] = details[-1]
        _save(state, state_path)
    medians = sorted(sorted(p["sessions"])[1] for p in details)
    out = {
        "metric": "img_per_s_per_chip_5000x256x256_blur3_stream",
        "process_sessions_img_s": medians,
        "median": medians[1],
        "min": medians[0],
        "max": medians[-1],
        "per_process_detail": details,
    }
    with open(os.path.join(ROOT, "benchmarks/flagship_sessions.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    log(f"flagship spread medians: {medians}")
    return {"ok": True, "medians": medians}


def _save(state: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(state, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/campaign_r4_state.json")
    ap.add_argument("--only", nargs="+", default=None)
    args = ap.parse_args()

    state: dict = {}
    if os.path.exists(args.state):
        with open(args.state) as f:
            state = json.load(f)

    steps: list[tuple[str, list[str], int, str | None]] = [
        ("verify_hw", [PY, "benchmarks/verify_hw.py"], 10800, None),
        ("stream-missing",
         [PY, "benchmarks/run_device_stream.py", "--cached-tune",
          "--pipelines", *MISSING_STREAM_ROWS], 14400, None),
        # chain: the int8 MXU band config is a first-class autotune
        # candidate now; median: likewise the int16 rank-network config
        # (its committed row predates both) — fresh sweeps, no cache.
        ("stream-chain-int8-resweep",
         [PY, "benchmarks/run_device_stream.py", "--pipelines", "chain",
          "median"],
         7200, None),
        ("probe_chain_int8", [PY, "benchmarks/probe_chain_int8.py"],
         5400, None),
        ("probe_rank79", [PY, "benchmarks/probe_rank79.py"], 5400, None),
        ("probe_rank_i16", [PY, "benchmarks/probe_rank_i16.py"], 5400, None),
        ("probe_separable", [PY, "benchmarks/probe_separable.py"],
         5400, None),
        ("device_decode", [PY, "benchmarks/run_device_decode.py"], 10800,
         "benchmarks/device_decode_v5e.json"),
        ("probe_transform", [PY, "benchmarks/probe_transform.py"],
         5400, None),
        ("corpus_slice", [PY, "benchmarks/run_corpus_slice.py"], 14400,
         None),
    ]

    for name, cmd, timeout_s, stdout_to in steps:
        if args.only and name not in args.only:
            continue
        if state.get(name, {}).get("ok"):
            log(f"step {name} already done; skipping")
            continue
        state[name] = run_step(name, cmd, timeout_s, stdout_to)
        _save(state, args.state)

    if (not args.only or "flagship" in args.only) and \
            not state.get("flagship", {}).get("ok"):
        state["flagship"] = flagship_spread(state, args.state)
        _save(state, args.state)

    # CPU-side: regenerate the doc tables from whatever landed.
    r = subprocess.run([PY, "benchmarks/render_tables.py"], cwd=ROOT)
    state["render_tables"] = {"ok": r.returncode == 0}
    _save(state, args.state)

    bad = {k: v for k, v in state.items()
           if isinstance(v, dict) and not v.get("ok")}
    log(f"campaign done; failures: {sorted(bad) if bad else 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
