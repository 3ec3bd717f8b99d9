"""Probe: rank filters at window sizes 7 and 9 on silicon.

`register_rank_filter` gates sizes to 3/5 because the unrolled odd-even
transposition network at 7/9 keeps 49/81 live views — the documented
Mosaic failure mode where every value of a wide unrolled graph gets its
own scoped-VMEM stack slot (see ROADMAP: the 64-plane DCT graph hit
116 MB).  This probe registers median7/median9 WITHOUT the gate and
answers, per path:

  1. exactness — fused Pallas chain + XLA planar vs the numpy oracle
     (itself cross-checked against PIL RankFilter at 7/9 first);
  2. compileability — which fused block sizes VMEM-OOM (recorded, not
     hidden), incl. a raised-cap candidate;
  3. rate — median-of-reps per-pass time vs median5 on the same stream.

Outcome feeds the size gate in `hipe_tpu.ops.blur.register_rank_filter`:
widen to 7/9 only where this probe is green.

Run serially on the real chip: python benchmarks/probe_rank79.py
Results land in benchmarks/probe_rank79.json.
"""

from __future__ import annotations

import functools
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_IMAGES = 1000  # 3000 planes: enough signal; median9 is ~1.3k VPU ops/px
# (bit-serial counting selection — see ops/blur.py _rank_select)
PASSES = 4
REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _pil_rank_gray(img: np.ndarray, size: int, rank: int) -> np.ndarray:
    from PIL import Image, ImageFilter

    return np.asarray(Image.fromarray(img).filter(
        ImageFilter.RankFilter(size, rank)))


def _register_unchecked(name: str, size: int, rank: int) -> None:
    """Ensure the stage is registered (idempotent on an exact spec match).

    Historical: this probe predates the 7/9 gate widening and used to
    bypass `register_rank_filter`'s size check. median7/median9 are
    builtins now, so this reduces to the (idempotent) public call — kept
    so the probe stays runnable against older checkouts of the gate.
    """
    from hipe_tpu.ops import blur as xblur

    xblur.register_rank_filter(name, size, rank)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.ops import pallas_blur as pb
    from hipe_tpu.ops import reference as oracle
    from hipe_tpu.utils.images import DEFAULT_IMAGE_256, hwc_to_planar

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    # Off-TPU: tiny stream + interpret-mode Pallas — a smoke run that
    # still asserts exactness on every variant; timings meaningless.
    num_images = NUM_IMAGES if on_tpu else 8  # 24 planes: all ks divide
    interpret = not on_tpu

    results: dict = {"backend": backend, "num_images": num_images}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_rank79.json")

    # -- 0. oracle vs PIL at 7/9 (host; the oracle then stands in on TPU) --
    rng = np.random.default_rng(79)
    small = rng.integers(0, 256, (40, 52), np.uint8)
    for size, rank in ((7, 24), (9, 40), (7, 0), (9, 80)):
        want = _pil_rank_gray(small, size, rank)
        got = oracle.rank_oracle(small[..., None], size, rank)[..., 0]
        exact = bool(np.array_equal(got, want))
        results[f"oracle_vs_pil_{size}_{rank}"] = exact
        log(f"oracle vs PIL size={size} rank={rank}: "
            f"{'exact' if exact else 'MISMATCH'}")
        if not exact:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
            return 1

    _register_unchecked("median7", 7, 24)
    _register_unchecked("median9", 9, 40)

    img = decode_file(DEFAULT_IMAGE_256)
    h, w, c = img.shape
    n = num_images * c
    planes = jnp.asarray(hwc_to_planar(img[None]))

    @jax.jit
    def materialize(p):
        return jnp.broadcast_to(p[None], (num_images, c, h, w)).reshape(
            n, h, w)

    stream = materialize(planes)
    np.asarray(stream[0, 0, :4])

    oracles = {
        name: hwc_to_planar(
            oracle.rank_oracle(img, size, rank)[None])
        for name, (size, rank) in (
            ("median5", (5, 12)), ("median7", (7, 24)), ("median9", (9, 40)),
        )
    }

    def timed(call, label, want):
        got = np.asarray(jax.jit(lambda s: call(s)[:c])(stream))
        err = int(np.max(np.abs(got.astype(int) - want.astype(int))))
        assert err == 0, (label, err)

        @functools.partial(jax.jit, static_argnames="r")
        def chained(s, r):
            out = lax.fori_loop(0, r, lambda i, x: call(x), s)
            return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

        float(np.asarray(chained(stream, 1)))
        float(np.asarray(chained(stream, 1 + PASSES)))
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(np.asarray(chained(stream, 1)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(chained(stream, 1 + PASSES)))
            t2 = time.perf_counter() - t0
            samples.append((t2 - t1) / PASSES)
        per_pass = statistics.median(samples)
        return {
            "per_pass_ms": round(per_pass * 1e3, 3),
            "img_per_s": round(num_images / per_pass),
            "max_abs_err": err,
        }

    from hipe_tpu.ops import blur as xblur

    # Liveness of the odd-even network ~= size^2 int32 plane temps: at
    # 256x256 each temp is ~k*0.26 MB, so 49/81 views demand tiny fused
    # blocks — sweep small k with a raised cap and let failures record.
    fused_grid = {
        "median5": ((8, None), (24, None)),
        "median7": ((1, None), (2, 64), (4, 64), (8, 64)),
        "median9": ((1, None), (2, 64), (4, 64)),
    }
    cases = []
    for name, grid in fused_grid.items():
        cases.append((f"{name}_xla",
                      lambda s, nm=name: xblur.filter_chain(
                          s, (nm,), h_axis=1, w_axis=2)))
        for k, vmem in grid:
            cases.append((
                f"{name}_fused_k{k}" + (f"_vmem{vmem}M" if vmem else ""),
                lambda s, nm=name, k=k, vmem=vmem:
                    pb.filter_chain_planar_pallas(
                        s, (nm,), block_planes=k, vmem_limit_mb=vmem,
                        interpret=interpret),
            ))
        # The halo-tiled path (what oversized planes route to): its
        # liveness-aware scoped-VMEM sizing generalizes over RANK_STAGES,
        # so it is the third candidate execution path for 7/9.
        if name != "median5":
            cases.append((
                f"{name}_tiled_th64",
                lambda s, nm=name: pb.filter_chain_planar_tiled_pallas(
                    s, (nm,), tile_h=64, interpret=interpret),
            ))

    # Size-9 FUSED kernels keep 81 window views live — the documented
    # Mosaic compile blowup mode (the tiled path already stalled >30 min
    # on silicon and routes to XLA; see _tiled_vmem). Run those cases
    # LAST, each in a daemon thread with a hard budget, so a compile
    # stall becomes a recorded go/no-go result instead of hanging the
    # campaign step; after the first timeout the helper may be wedged,
    # so remaining risky cases are skipped and the probe exits via
    # os._exit (atexit hooks could block on the stuck client).
    COMPILE_BUDGET_S = 1200 if on_tpu else 10 ** 6
    risky = [c for c in cases if c[0].startswith("median9_fused")]
    safe = [c for c in cases if not c[0].startswith("median9_fused")]

    import threading

    wedged = False
    for label, call in safe + risky:
        name = label.split("_")[0]
        if wedged and label.startswith("median9_fused"):
            results[label] = {"error": "skipped: compile helper wedged "
                                       "by an earlier size-9 stall"}
            log(f"{label:28s} SKIPPED (wedged helper)")
        elif label.startswith("median9_fused") and on_tpu:
            slot: dict = {}

            def run(label=label, call=call, name=name, slot=slot):
                try:
                    slot["result"] = timed(call, label, oracles[name])
                except Exception as e:  # noqa: BLE001
                    slot["result"] = {
                        "error": f"{type(e).__name__}: {str(e)[:200]}"}

            th = threading.Thread(target=run, daemon=True)
            th.start()
            th.join(COMPILE_BUDGET_S)
            if th.is_alive():
                wedged = True
                results[label] = {
                    "error": f"compile-timeout >{COMPILE_BUDGET_S}s "
                             "(81-live-view Mosaic blowup)"}
                log(f"{label:28s} COMPILE-TIMEOUT")
            else:
                results[label] = slot["result"]
                if "error" in slot["result"]:
                    log(f"{label:28s} FAILED")
                else:
                    log(f"{label:28s} "
                        f"{results[label]['per_pass_ms']:9.2f} ms  "
                        f"{results[label]['img_per_s']:9,d} img/s")
        else:
            try:
                results[label] = timed(call, label, oracles[name])
                log(f"{label:28s} {results[label]['per_pass_ms']:9.2f} ms  "
                    f"{results[label]['img_per_s']:9,d} img/s")
            except Exception as e:  # noqa: BLE001 — OOMs are a probe result
                results[label] = {
                    "error": f"{type(e).__name__}: {str(e)[:200]}"}
                log(f"{label:28s} FAILED: {type(e).__name__}")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    log(f"wrote {out_path}")
    if wedged:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
