"""Round-4 heterogeneous corpus slice: filled exec-config columns +
non-blur pipelines through the real CPU+TPU Engine.

Round 2's corpus predates the per-lane execution-config columns, so every
committed per_run.csv row has blank wg_w/wg_h (the round-3 code fix —
report.py fills them — was never exercised on silicon). This slice
regenerates a reduced grid with the columns filled AND routes two
non-blur pipelines through the heterogeneous path on real hardware:

  - blur3      A1 + A2 (the reference workload, both approaches)
  - median5    A2 (radius-2 rank stage through the halo row split)
  - contrast   A1 (a GlobalStatsPipeline through the image-level Engine;
                A2 correctly rejects global-stats pipelines with a
                pointer at the collective helpers — pipelines.py)

Grid: batch {35, 100} x 3 runs x 5000 images (the committed corpus
scale). Output: benchmarks/corpus_v5e_r4/<approachN>_<pipeline>/ with
the reference-schema per_run.csv / avg_by_batch.csv / per-run logs
(`/root/reference/data/approach2/approach2/per_run.csv` column contract).

Run serially on the real chip: python benchmarks/run_corpus_slice.py
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-images", type=int, default=5000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--batch-sizes", type=int, nargs="+", default=[35, 100])
    ap.add_argument("--image", default="/root/reference/image_320x240.jpg")
    ap.add_argument("--out", default=os.path.join(BENCH_DIR, "corpus_v5e_r4"))
    ap.add_argument("--smoke-cpu", action="store_true",
                    help="two CPU devices as the lane pair (off-TPU smoke "
                    "test of the runner; never for committed corpora)")
    args = ap.parse_args()

    from hipe_tpu.io_.jpeg import decode_file
    from hipe_tpu.parallel.autotune import calibrate_ratio, sweep_batch_sizes
    from hipe_tpu.profiling.corpus import write_corpus
    from hipe_tpu.runtime.engine import EngineConfig
    from hipe_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    image = np.ascontiguousarray(decode_file(args.image))

    cpu_dev = accel_dev = None
    if args.smoke_cpu:
        import jax

        devs = jax.devices("cpu")
        cpu_dev, accel_dev = devs[0], devs[min(1, len(devs) - 1)]

    cases = [
        (1, "blur3"),
        (2, "blur3"),
        (2, "median5"),
        (1, "contrast"),
    ]
    for approach, pipeline in cases:
        base = EngineConfig(approach=approach, mode="both", batch_size=100,
                            num_images=args.num_images, pipeline=pipeline)
        print(f"[A{approach} {pipeline}] calibrating ratio...",
              file=sys.stderr)
        tuned = calibrate_ratio(
            base, image, max_iters=3, tol_pct=3.0,
            num_images=min(args.num_images, 300),
            cpu_device=cpu_dev, accel_device=accel_dev,
        )
        print(f"[A{approach} {pipeline}] tuned ratio {tuned.ratio:.3f} "
              f"(history {tuned.history})", file=sys.stderr)
        cfg = dataclasses.replace(base, gpu_ratio=tuned.ratio)
        stats = sweep_batch_sizes(cfg, image,
                                  batch_sizes=args.batch_sizes,
                                  runs=args.runs,
                                  cpu_device=cpu_dev, accel_device=accel_dev)
        out_dir = os.path.join(args.out, f"approach{approach}_{pipeline}")
        per_run, _ = write_corpus(stats, out_dir)
        # The column contract this slice exists to prove: every committed
        # row carries the per-lane execution config (the reference CSVs
        # write wg_w/wg_h = 16,16 — data/approach2/per_run.csv).
        with open(per_run) as f:
            for row in csv.DictReader(f):
                assert row["wg_w"] and row["wg_h"], (
                    f"blank execution-config column in {per_run}: {row}"
                )
        best = max(stats, key=lambda s: s.images_per_sec)
        print(f"[A{approach} {pipeline}] best: batch={best.batch_size} "
              f"{best.images_per_sec:.0f} img/s", file=sys.stderr)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
