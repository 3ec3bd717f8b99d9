"""Round-4 on-silicon measurement campaign (one resilient command).

Everything round 4 still owes silicon, in order, serially (concurrent TPU
processes skew timings ~2x):

  1.  verify_hw.py           — bit-exactness matrix incl. the round-4
                               cases (int8 chain bands, exotic encode)
  2.  run_device_stream.py   — one step PER registered pipeline with no
                               committed throughput row (incremental merge
                               + the persisted autotune cache make each
                               step independently resumable)
  3.  run_device_stream.py   — chain + median re-sweeps (the int8 MXU
                               band / int16 rank-network configs are
                               first-class autotune candidates now)
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
chained-kernel execution (bench.backend_healthy). Three failure classes:

  * poisoned (rc=42 / UNAVAILABLE / FAILED_PRECONDITION / worker crash):
    re-gate and retry in a fresh process.
  * transient (killed by a signal, step timeout, or the HANG WATCHDOG —
    the tunnel dropping mid-step leaves the child blocked in a remote
    call using no CPU; observed 30+ min at 4 s of CPU): kill, re-gate,
    retry. Never counts toward the deterministic-failure bail.
  * deterministic (clean nonzero exit, healthy backend): recorded after
    2 attempts and the campaign moves on.

Progress persists in /tmp/campaign_r4_state.json so a re-run skips
finished steps, and a compact auditable per-step record (attempts,
classification, artifact) is mirrored into benchmarks/campaign_r5.json on
every save so the round's measurement story lives in the repo, not /tmp.
Per-step stdout/stderr stream live to /tmp/campaign_steps/<name>.{out,err}
for monitoring.

Round 5 additions: full_scale refresh steps (one depth-2 Engine run + one
greedy fleet run at the current kernel configs, per the round-4 verdict)
and the flagship spread moved ahead of the probes (it unblocks the
doc-drift tests).

Usage: python benchmarks/run_round4_campaign.py [--state PATH] [--only NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # tunnel_alive / backend_healthy live here

MISSING_STREAM_ROWS = [
    "denoise", "erode", "dilate", "open", "close", "median5",
    "posterize", "equalize", "autocontrast", "contrast", "color",
    "sharpness", "mode", "mode5",
]

PY = sys.executable
STEP_LOG_DIR = "/tmp/campaign_steps"

# Hang watchdog: a child that accrues < HANG_CPU_S of CPU over
# HANG_WINDOW_S while the autotune/output artifacts also go untouched is
# blocked on a dead tunnel (legit remote-compile stalls resolve well
# inside this window; observed worst ~600 s).
HANG_WINDOW_S = 1500
HANG_CPU_S = 5.0


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


def _child_cpu_s(pid: int) -> float:
    """utime+stime of the child (all threads) in seconds, 0 if gone."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        hz = os.sysconf("SC_CLK_TCK")
        return (int(parts[11]) + int(parts[12])) / hz  # utime, stime
    except (OSError, IndexError, ValueError):
        return 0.0


def _run_watched(cmd: list[str], timeout_s: int, out_path: str,
                 err_path: str) -> tuple[int | None, str]:
    """Run cmd streaming stdout/err to files; kill on timeout or hang.

    Returns (returncode, kind) where kind is 'exit' | 'timeout' | 'hang'.
    """
    with open(out_path, "ab", buffering=0) as fo, \
            open(err_path, "ab", buffering=0) as fe:
        p = subprocess.Popen(cmd, cwd=ROOT, stdout=fo, stderr=fe)
        t0 = time.time()
        last_cpu = 0.0
        last_progress = t0
        while True:
            rc = p.poll()
            if rc is not None:
                return rc, "exit"
            now = time.time()
            cpu = _child_cpu_s(p.pid)
            if cpu - last_cpu >= HANG_CPU_S:
                last_cpu, last_progress = cpu, now
            kind = None
            if now - t0 > timeout_s:
                kind = "timeout"
            elif now - last_progress > HANG_WINDOW_S:
                kind = "hang"
            if kind:
                log(f"killing child pid={p.pid} ({kind}; cpu={cpu:.1f}s)")
                p.send_signal(signal.SIGTERM)
                try:
                    p.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.wait()
                return None, kind
            time.sleep(20)


def _tail(path: str, n: int) -> str:
    try:
        with open(path, "rb") as f:
            f.seek(0, 2)
            f.seek(max(0, f.tell() - n))
            return f.read().decode(errors="replace")
    except OSError:
        return ""


def run_step(name: str, cmd: list[str], timeout_s: int,
             stdout_to: str | None = None, retries: int = 10,
             copy_out_to: str | None = None) -> dict:
    os.makedirs(STEP_LOG_DIR, exist_ok=True)
    out_path = os.path.join(STEP_LOG_DIR, f"{name}.out")
    err_path = os.path.join(STEP_LOG_DIR, f"{name}.err")
    deterministic_fails = 0
    attempts: list[dict] = []
    for attempt in range(1, retries + 1):
        wait_healthy()
        log(f"step {name} attempt {attempt}/{retries}: {' '.join(cmd)}")
        # Truncate per-attempt so copy_out_to captures exactly one clean run.
        open(out_path, "wb").close()
        t0 = time.time()
        rc, kind = _run_watched(cmd, timeout_s, out_path, err_path)
        dt = time.time() - t0
        rec = {"kind": kind, "rc": rc, "seconds": round(dt, 1)}
        attempts.append(rec)
        if kind != "exit":
            rec["classification"] = "transient"
            log(f"step {name} {kind.upper()} after {dt:.0f}s; re-gating")
            continue
        if rc == 0:
            rec["classification"] = "ok"
            if stdout_to:
                # Only replace the committed artifact on success, and only
                # with the final JSON line (logs go to stderr by contract).
                line = _tail(out_path, 65536).strip().splitlines()[-1]
                json.loads(line)  # validate before overwriting
                with open(os.path.join(ROOT, stdout_to), "w") as f:
                    f.write(line)
                log(f"wrote {stdout_to}")
            if copy_out_to:
                with open(out_path, "rb") as src, \
                        open(os.path.join(ROOT, copy_out_to), "wb") as dst:
                    dst.write(src.read())
                log(f"wrote {copy_out_to}")
            log(f"step {name} OK in {dt:.0f}s")
            # 64 KiB: flagship_spread parses bench.py's single JSON stdout
            # line (~1.6 KB and growing with the autotune grid) from this.
            return {"ok": True, "seconds": round(dt, 1),
                    "attempts": attempts,
                    "artifact": stdout_to or copy_out_to,
                    "stdout_tail": _tail(out_path, 65536)}
        err_tail = _tail(err_path, 4000)
        poisoned = rc == 42 or any(
            tag in err_tail for tag in
            ("UNAVAILABLE", "FAILED_PRECONDITION", "worker process crashed",
             # compile-helper 500s: tunnel infra down, not a real failure
             "remote_compile", "HTTP 500"))
        transient = rc is not None and rc < 0  # killed by a signal
        rec["classification"] = ("poisoned" if poisoned else
                                 "transient" if transient else
                                 "deterministic")
        log(f"step {name} rc={rc} poisoned={poisoned} "
            f"transient={transient} ({dt:.0f}s); stderr tail:\n"
            f"{err_tail[-1500:]}")
        if not poisoned and not transient:
            deterministic_fails += 1
            if deterministic_fails >= 2:
                # A deterministic failure won't heal with retries.
                return {"ok": False, "rc": rc, "attempts": attempts,
                        "stderr_tail": err_tail[-3000:]}
        time.sleep(120)
    return {"ok": False, "rc": "retries-exhausted", "attempts": attempts}


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


REPO_STATE = os.path.join(ROOT, "benchmarks", "campaign_r5.json")


def _save(state: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(state, f, indent=1)
    # Mirror a compact auditable record into the repo (round-4 verdict #7):
    # per step — outcome, attempts with failure classification, artifact —
    # without the bulky stdout tails.
    compact = {}
    for k, v in state.items():
        if not isinstance(v, dict):
            compact[k] = v
            continue
        compact[k] = {kk: vv for kk, vv in v.items()
                      if kk not in ("stdout_tail", "stderr_tail")}
    with open(REPO_STATE, "w") as f:
        json.dump(compact, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/campaign_r4_state.json")
    ap.add_argument("--only", nargs="+", default=None)
    args = ap.parse_args()

    state: dict = {}
    if os.path.exists(args.state):
        with open(args.state) as f:
            state = json.load(f)

    steps: list[dict] = [
        dict(name="verify_hw", cmd=[PY, "benchmarks/verify_hw.py"],
             timeout_s=10800),
    ]
    # One step per missing pipeline: each is short (bounded tunnel
    # exposure), independently resumable (incremental JSON merge + the
    # persisted autotune cache), and a failure costs only its own row.
    for p in MISSING_STREAM_ROWS:
        steps.append(dict(name=f"stream-{p}",
                          cmd=[PY, "benchmarks/run_device_stream.py",
                               "--cached-tune", "--pipelines", p],
                          timeout_s=7200))
    # chain: the int8 MXU band config is a first-class autotune candidate
    # now; median: likewise the int16 rank-network config (their committed
    # rows predate both) — fresh sweeps, no cache.
    steps += [
        dict(name="stream-chain-resweep",
             cmd=[PY, "benchmarks/run_device_stream.py",
                  "--pipelines", "chain"], timeout_s=7200),
        dict(name="stream-median-resweep",
             cmd=[PY, "benchmarks/run_device_stream.py",
                  "--pipelines", "median"], timeout_s=7200),
        # Flagship spread early: it unblocks the doc-drift tests (the
        # round-4 capture sits above the committed prose band).
        dict(name="flagship", special="flagship"),
        dict(name="probe_chain_int8",
             cmd=[PY, "benchmarks/probe_chain_int8.py"], timeout_s=5400),
        dict(name="probe_rank79", cmd=[PY, "benchmarks/probe_rank79.py"],
             timeout_s=5400),
        dict(name="probe_rank_i16", cmd=[PY, "benchmarks/probe_rank_i16.py"],
             timeout_s=5400),
        # Round 5: the widened rank gate registers median7/median9 as
        # first-class pipelines — they owe stream rows like everyone else.
        dict(name="stream-median7",
             cmd=[PY, "benchmarks/run_device_stream.py",
                  "--pipelines", "median7"], timeout_s=7200),
        dict(name="stream-median9",
             cmd=[PY, "benchmarks/run_device_stream.py",
                  "--pipelines", "median9"], timeout_s=7200),
        dict(name="probe_separable",
             cmd=[PY, "benchmarks/probe_separable.py"], timeout_s=5400),
        dict(name="device_decode", cmd=[PY, "benchmarks/run_device_decode.py"],
             timeout_s=10800, stdout_to="benchmarks/device_decode_v5e.json"),
        dict(name="probe_transform", cmd=[PY, "benchmarks/probe_transform.py"],
             timeout_s=5400),
        dict(name="corpus_slice", cmd=[PY, "benchmarks/run_corpus_slice.py"],
             timeout_s=14400),
        # full_scale refresh (round-4 verdict #8): one depth-2 Engine run +
        # one greedy fleet run at the current (int8-era) kernel configs, so
        # the committed hardware logs and CSV rows regenerate with filled
        # exec-config columns.
        dict(name="engine-depth2",
             cmd=[PY, "-m", "hipe_tpu.cli", "approach1", "both", "0.105",
                  "100", "--num-images", "5000", "--pipeline-depth", "2",
                  "--csv", "benchmarks/full_scale/full_runs.csv"],
             timeout_s=7200,
             copy_out_to="benchmarks/full_scale/a1_5000_depth2_r5.txt"),
        dict(name="fleet-greedy",
             cmd=[PY, "benchmarks/run_fleet.py", "--scheduler", "greedy"],
             timeout_s=7200),
    ]
    # Lowest priority (after everything owed): fresh int8-era sweeps for
    # the remaining rows measured before the int8 band configs existed —
    # blur3 re-tuned to pallas_i8_k25_alias (+14%); these may move too.
    for p in ("blur5", "blur7", "blur9", "sharpen", "edge",
              "invert", "solarize"):
        steps.append(dict(name=f"stream-{p}-resweep",
                          cmd=[PY, "benchmarks/run_device_stream.py",
                               "--pipelines", p], timeout_s=7200))

    for st in steps:
        name = st["name"]
        if args.only and name not in args.only:
            continue
        if state.get(name, {}).get("ok"):
            log(f"step {name} already done; skipping")
            continue
        if st.get("special") == "flagship":
            state[name] = flagship_spread(state, args.state)
        else:
            state[name] = run_step(name, st["cmd"], st["timeout_s"],
                                   st.get("stdout_to"),
                                   copy_out_to=st.get("copy_out_to"))
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
