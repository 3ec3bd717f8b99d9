"""Device-resident stream processing — the TPU serving fast path.

The reference's throughput ceiling was host<->device transfer of every image
over PCIe (`/root/reference/README.md:85`: CPU becomes communication-bound).
The TPU-native design keeps the stream resident in HBM: inputs are staged
(or, for the replicated stream simulation of `heterogeneous_blur.c:431-442`,
generated) on device, the whole stream is processed by one compiled program,
and only checksums/requested outputs return to the host. This is the mode
`bench.py` measures and the deployment shape for TPU serving (host feeds
batches asynchronously while the chip processes the previous ones).

Throughput measurement uses pass-count differencing: chained passes (each
pass consumes the previous pass's output, so XLA can neither hoist nor elide
work) timed at two different pass counts; the difference isolates
steady-state per-pass time from fixed dispatch/sync latency.

The fastest execution config is *measured, not assumed*: :meth:`autotune`
times the XLA path, the plain Pallas path, and the in-place (input/output-
aliased) Pallas path over a block-size sweep, then routes through the
winner. On v5e the aliased Pallas kernel wins by ~2x (in-place HBM writes
skip the write-allocate path; see benchmarks/probe_hbm.json: 288 GB/s plain
-> 630-820 GB/s aliased).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from hipe_tpu.models import pipelines as plib

# Accepting a cached config requires its fresh one-shot timing to stay
# within this factor of the stored one; beyond it the full sweep re-runs.
# Sized to shared-chip variance (CLAUDE.md: concurrent processes skew ~2x;
# quiet-window session spread is ~1.5%).
_RETUNE_FACTOR = 1.6

# Exception-message tags that mark a config skip as poisoned INFRA (tunnel
# compile helper down / TPU worker crash-cycling) rather than a genuine
# per-config rejection; one of these in a sweep invalidates the sweep.
_POISONED_SKIP_TAGS = ("UNAVAILABLE", "FAILED_PRECONDITION",
                       "worker process crashed", "remote_compile",
                       "HTTP 500")
_TUNE_CACHE_VERSION = 1


def _default_tune_cache_path() -> str:
    from hipe_tpu.utils.cache import DEFAULT_DIR

    return os.path.join(DEFAULT_DIR, "autotune.json")


class DeviceStreamRunner:
    """Process an N-image stream resident in device HBM."""

    def __init__(
        self,
        pipeline: plib.Pipeline | str = "blur3",
        *,
        num_images: int = 5000,
        image: np.ndarray | None = None,
        use_pallas: bool | None = None,
        device=None,
        tune_cache_path: str | None = None,
    ):
        self.pipeline = plib.get(pipeline) if isinstance(pipeline, str) else pipeline
        self.num_images = num_images
        if image is None:
            from hipe_tpu.utils.images import load_test_image

            image = load_test_image()
        self.image = image
        h, w, c = image.shape
        self.shape = (h, w, c)
        self.device = device or jax.devices()[0]
        if use_pallas is None:
            use_pallas = getattr(self.device, "platform", "cpu") != "cpu"
        self.use_pallas = use_pallas

        from hipe_tpu.utils.images import hwc_to_planar

        planes = jax.device_put(
            jnp.asarray(hwc_to_planar(image[None])), self.device
        )

        n, hh, ww = num_images * c, h, w
        self.n_planes = n

        @jax.jit
        def materialize(p):
            return jnp.broadcast_to(
                p[None], (num_images, c, hh, ww)
            ).reshape(n, hh, ww)

        # The device-resident stream: distinct HBM buffers per image
        # (the reference's memcpy stream simulation, in HBM).
        self.stream = materialize(planes)

        self.config = {
            "path": "pallas" if self.use_pallas else "xla",
            "block": None,
            "alias": False,
            "vmem_mb": None,
        }
        self.tuning: dict | None = None
        self.tune_cache_path = tune_cache_path or _default_tune_cache_path()
        self._build(**self.config)

    # ---- autotune-winner persistence (the reference's "recommended ratio
    # printed as a re-run command", heterogeneous_blur.c:712-723, made
    # automatic: the chosen execution config is cached per workload and
    # re-verified with one timing on the next run) ----

    def _tune_key(self) -> str:
        h, w, c = self.shape
        dev = getattr(self.device, "device_kind", None) or getattr(
            self.device, "platform", "unknown"
        )
        return f"{self.pipeline.name}|{h}x{w}x{c}|n{self.num_images}|{dev}"

    def _load_cached_config(self):
        try:
            with open(self.tune_cache_path) as f:
                data = json.load(f)
            if data.get("version") != _TUNE_CACHE_VERSION:
                return None
            ent = data.get("entries", {}).get(self._tune_key())
            if ent is None:
                return None
            return ent["label"], dict(ent["config"]), float(ent["per_pass_s"])
        except (OSError, ValueError, KeyError, TypeError):
            return None

    def _store_cached_config(self, label: str, cfg: dict,
                             per_pass_s: float) -> None:
        try:
            try:
                with open(self.tune_cache_path) as f:
                    data = json.load(f)
                if data.get("version") != _TUNE_CACHE_VERSION:
                    data = {"version": _TUNE_CACHE_VERSION, "entries": {}}
            except (OSError, ValueError):
                data = {"version": _TUNE_CACHE_VERSION, "entries": {}}
            data["entries"][self._tune_key()] = {
                "label": label, "config": cfg, "per_pass_s": per_pass_s,
            }
            os.makedirs(os.path.dirname(self.tune_cache_path), exist_ok=True)
            tmp = self.tune_cache_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(data, f, indent=1)
            os.replace(tmp, self.tune_cache_path)
        except OSError:
            pass  # cache is an optimization; never fail the run for it

    def _build(self, path: str, block: int | None, alias: bool,
               vmem_mb: int | None = None, int8: bool = False,
               i16: bool = False) -> None:
        pipe = self.pipeline
        # int8/i16 are opt-in per config (autotune adds them only for
        # band-stage / rank-stage pipelines respectively); omitted from the
        # kwargs otherwise so pipelines whose apply_planar has no such knob
        # (global-stats) work unchanged.
        extra = {}
        if int8:
            extra["int8_bands"] = True
        if i16:
            extra["int16_ranks"] = True

        def one_pass(s):
            return pipe.apply_planar(
                s, use_pallas=(path == "pallas"), alias=alias,
                block_planes=block, vmem_limit_mb=vmem_mb, **extra,
            )

        self._one_pass = one_pass

        @functools.partial(jax.jit, static_argnames="r")
        def chained(s, r):
            out = lax.fori_loop(0, r, lambda i, x: one_pass(x), s)
            return jnp.sum(out[::97, ::3, ::64].astype(jnp.int32))

        self._chained = chained

    def _sync(self, v) -> float:
        return float(np.asarray(v))

    def block_candidates(self, lo: int = 16, hi: int = 64) -> list[int]:
        """Divisors of the plane count in the default-VMEM-cap range."""
        n = self.n_planes
        return [k for k in range(lo, hi + 1) if n % k == 0]

    def rank_block_candidates(self, live_taps: int,
                              limit: int = 4) -> list[tuple[int, int]]:
        """(block, vmem_limit_mb) pairs sized from a rank chain's live set.

        Rank stages keep ``live_taps`` int32 window views per plane alive
        in the fused kernel (25/49/81 for size 5/7/9), so viable blocks
        are tiny — k<=~13 for median5 at 256x256, k<=4 for median9 — far
        below the default 16..64 sweep, whose every entry would OOM. Cap
        sized like ``_tiled_vmem`` (x1.3 headroom), max 110 MB; returns
        the largest few viable blocks.
        """
        n, px = self.n_planes, self.shape[0] * self.shape[1]
        per_plane = (live_taps + 6) * px * 4
        out = []
        for k in range(13, 0, -1):
            if n % k:
                continue
            mb = -(-per_plane * k * 13 // (10 * 2**20))
            if mb > 110:
                continue
            out.append((k, max(24, mb)))
            if len(out) >= limit:
                break
        return out

    def big_block_candidates(self, lo: int = 65, hi: int = 250,
                             limit: int = 4) -> list[tuple[int, int]]:
        """(block, vmem_limit_mb) pairs past Mosaic's 16 MB scoped cap.

        v5e has 128 MB VMEM/core; measured (probe_vmem.json) k=200 @ 96 MB
        streams 760 GB/s vs 637 at the default cap. The limit is sized
        from the kernel's measured working set (~7 B/px incl. pipelining),
        capped at 110 MB; uncompilable pairs are skipped by autotune.
        """
        n, px = self.n_planes, self.shape[0] * self.shape[1]
        out = []
        for k in range(hi, lo - 1, -1):
            if n % k == 0:
                # Never tighten below Mosaic's 16 MB default (small images
                # would otherwise fail blocks that compile fine uncapped).
                mb = min(110, max(24, -(-k * px * 7 // 2**20)))
                out.append((k, mb))
                if len(out) >= limit:
                    break
        return out

    def autotune(self, passes: int = 4, reps: int = 2,
                 candidates: list[int] | None = None,
                 cache: bool = True, retune: bool = False) -> dict:
        """Measure XLA vs Pallas vs aliased-Pallas(block sweep); keep winner.

        The reference's calibration loop tunes its ratio by measurement
        (README.md:87-93); the TPU analog tunes the kernel execution config.
        Returns {config_label: per_pass_seconds} and rebuilds the runner
        around the fastest entry. Configs that fail to compile (e.g. VMEM
        overflow at large blocks) are skipped — and recorded in
        ``self.tuning["skipped"]`` with the exception class, never hidden.

        With ``cache=True`` (default) the winner is persisted per
        (pipeline, geometry, stream size, chip kind); the next run
        re-verifies the cached config with ONE timing and only re-sweeps
        on regression past ``_RETUNE_FACTOR`` or ``retune=True``.
        ``self.tuning["cache_hit"]`` records which path ran.
        """
        use_cache = cache and candidates is None
        if use_cache and not retune:
            cached = self._load_cached_config()
            if cached is not None:
                label, cfg, cached_t = cached
                try:
                    self._build(**cfg)
                    t = self._measure_per_pass(passes=passes, reps=reps)
                except Exception as e:  # noqa: BLE001
                    head = (str(e).strip().splitlines()[0][:220]
                            if str(e) else "")
                    print(
                        f"autotune: cached config {label} failed "
                        f"({type(e).__name__}: {head}); re-sweeping",
                        file=sys.stderr,
                    )
                else:
                    if t <= cached_t * _RETUNE_FACTOR:
                        self.config = cfg
                        self.tuning = {
                            "chosen": label,
                            "per_pass_s": {label: t},
                            "cache_hit": True,
                            "cached_per_pass_s": cached_t,
                            "skipped": {},
                        }
                        # Keep the FASTEST observation as the stored
                        # baseline: re-storing each fresh timing would
                        # ratchet the 1.6x acceptance threshold upward
                        # and let gradual regressions pass forever.
                        self._store_cached_config(label, cfg,
                                                  min(t, cached_t))
                        return {label: t}
                    print(
                        f"autotune: cached config {label} regressed "
                        f"({t * 1e3:.2f} ms vs cached "
                        f"{cached_t * 1e3:.2f} ms); re-sweeping",
                        file=sys.stderr,
                    )
        configs: list[tuple[str, dict]] = [
            ("xla", {"path": "xla", "block": None, "alias": False,
                     "vmem_mb": None}),
            ("pallas", {"path": "pallas", "block": None, "alias": False,
                        "vmem_mb": None}),
        ]
        h, w, _ = self.shape
        if (self.use_pallas and not plib.Pipeline.routes_tiled(h, w)
                and self.pipeline.has_pallas_blocks):
            # Oversized planes route to the tiled kernels, and
            # global-statistics pipelines have no Pallas kernels at all —
            # neither takes alias/block knobs, so sweeping them would time
            # identical programs and report a fictitious chosen config.
            for k in candidates or self.block_candidates():
                configs.append(
                    (f"pallas_k{k}_alias",
                     {"path": "pallas", "block": k, "alias": True,
                      "vmem_mb": None})
                )
            if candidates is None:
                for k, mb in self.big_block_candidates():
                    configs.append(
                        (f"pallas_k{k}_vmem{mb}M_alias",
                         {"path": "pallas", "block": k, "alias": True,
                          "vmem_mb": mb})
                    )
            if getattr(self.pipeline, "has_band_stages", False):
                # int8 x int8 -> int32 MXU bands (2x the bf16 MXU rate on
                # v5e, bit-identical) — a measured config like any other:
                # adopted only where it times fastest. Sweep the same
                # block grid as the bf16 configs.
                for k in candidates or self.block_candidates():
                    configs.append(
                        (f"pallas_i8_k{k}_alias",
                         {"path": "pallas", "block": k, "alias": True,
                          "vmem_mb": None, "int8": True})
                    )
                if candidates is None:
                    for k, mb in self.big_block_candidates():
                        configs.append(
                            (f"pallas_i8_k{k}_vmem{mb}M_alias",
                             {"path": "pallas", "block": k, "alias": True,
                              "vmem_mb": mb, "int8": True})
                        )
            if getattr(self.pipeline, "has_rank_stages", False):
                # int16 min/max networks for the rank-family stages
                # (2 elements/VPU lane, bit-identical order statistics) —
                # measured like any other config; Mosaic rejections are
                # recorded skips, never silent.
                for k in candidates or self.block_candidates():
                    configs.append(
                        (f"pallas_i16_k{k}_alias",
                         {"path": "pallas", "block": k, "alias": True,
                          "vmem_mb": None, "i16": True})
                    )
                if candidates is None:
                    for k, mb in self.big_block_candidates():
                        configs.append(
                            (f"pallas_i16_k{k}_vmem{mb}M_alias",
                             {"path": "pallas", "block": k, "alias": True,
                              "vmem_mb": mb, "i16": True})
                        )
            live = 3
            filters = getattr(self.pipeline, "filters", None)
            if filters:
                from hipe_tpu.ops.blur import chain_live_taps

                live = chain_live_taps(filters)
            if live >= 25 and candidates is None:
                # Wide rank windows (size>=5): the only viable fused
                # blocks are tiny — sweep a live-set-sized grid the
                # default 16..64 sweep can't reach (int32 and int16
                # network variants alike).
                for k, mb in self.rank_block_candidates(live):
                    configs.append(
                        (f"pallas_k{k}_vmem{mb}M_alias",
                         {"path": "pallas", "block": k, "alias": True,
                          "vmem_mb": mb})
                    )
                    if getattr(self.pipeline, "has_rank_stages", False):
                        configs.append(
                            (f"pallas_i16_k{k}_vmem{mb}M_alias",
                             {"path": "pallas", "block": k, "alias": True,
                              "vmem_mb": mb, "i16": True})
                        )
        timings: dict[str, float] = {}
        skipped: dict[str, str] = {}
        best_label, best_cfg, best_t = None, None, float("inf")
        for label, cfg in configs:
            try:
                self._build(**cfg)
                t = self._measure_per_pass(passes=passes, reps=reps)
            except Exception as e:  # noqa: BLE001 — skip uncompilable
                # configs, but record why: a silent skip here once meant a
                # Pallas lowering break would quietly route to the 20x
                # slower XLA path with no cause attached.
                # Keep the message head too: a bare class name once cost a
                # full diagnosis cycle (every config "JaxRuntimeError" —
                # OOM? Mosaic reject? poisoned client? — unknowable).
                head = str(e).strip().splitlines()[0][:220] if str(e) else ""
                skipped[label] = f"{type(e).__name__}: {head}"
                print(
                    f"autotune: skipped {label}: {skipped[label]}",
                    file=sys.stderr,
                )
                if any(tag in skipped[label]
                       for tag in _POISONED_SKIP_TAGS):
                    # Fail the sweep on the FIRST poisoned-infra skip:
                    # sweeping the rest of the grid against a 500ing
                    # compile helper just burns the retry window (and a
                    # later candidate can block instead of erroring,
                    # turning a 2-min fast-fail into a 25-min hang).
                    raise RuntimeError(
                        "degraded autotune sweep (poisoned-infra skip "
                        f"at {label}): {skipped[label]}"
                    ) from e
                continue
            timings[label] = t
            if t < best_t:
                best_label, best_cfg, best_t = label, cfg, t
        poisoned = {
            k: v for k, v in skipped.items()
            if any(tag in v for tag in _POISONED_SKIP_TAGS)
        }
        if poisoned:
            # A config skipped for an INFRA reason (remote compile helper
            # 500ing, crashed/restarting worker) means the whole sweep ran
            # degraded — the winner among the survivors is not a
            # measurement (observed 2026-08-21: XLA compiled fine while
            # every pallas candidate hit HTTP 500; the "winner" would have
            # been a 20x-slow XLA row). Raise so EVERY caller (bench.py,
            # run_device_stream.py, probes) discards the sweep; genuine
            # VMEM/Mosaic rejections carry other messages and remain
            # honest recorded skips.
            raise RuntimeError(
                "degraded autotune sweep (poisoned-infra skips: "
                f"{sorted(poisoned)}): {sorted(set(poisoned.values()))[0]}"
            )
        assert best_cfg is not None, "no execution config compiled"
        self.config = best_cfg
        self._build(**best_cfg)
        self.tuning = {
            "chosen": best_label,
            "per_pass_s": timings,
            "cache_hit": False,
            "skipped": skipped,
        }
        if use_cache:
            self._store_cached_config(best_label, best_cfg, best_t)
        return timings

    def verify_max_abs_err(self) -> int:
        """Max-abs pixel error of one image vs the reference oracle."""
        from hipe_tpu.ops import reference as oracle
        from hipe_tpu.utils.images import hwc_to_planar

        c = self.shape[2]
        # Run the full stream (tuned Pallas configs are built for its shape)
        # and slice the first image's planes on-device — only ~H*W*C bytes
        # cross the host link.
        got = np.asarray(
            jax.jit(lambda s: self._one_pass(s)[:c])(self.stream)
        )
        ref_fn = {
            "blur3": lambda im: oracle.gaussian_blur_int_oracle(im, 1),
            "blur5": lambda im: oracle.gaussian_blur_int_oracle(im, 2),
            "blur9": lambda im: oracle.gaussian_blur_int_oracle(im, 4),
        }.get(self.pipeline.name)
        if ref_fn is None:
            # The pipeline's own XLA path (filter chains and the
            # global-statistics pipelines alike) is the oracle; its
            # CPU-exactness is pinned by the test suite.
            want_img = np.asarray(self.pipeline(jnp.asarray(self.image)))
        else:
            want_img = ref_fn(self.image)
        want = hwc_to_planar(want_img[None])
        return int(np.max(np.abs(got.astype(int) - want.astype(int))))

    def _measure_per_pass(self, passes: int, reps: int) -> float:
        """Median-of-`reps` steady-state seconds/pass via differencing.

        Median, not min: each chained call carries a few ms of tunnel
        jitter, and the difference (t2 - t1) inherits it with either
        sign — min-selection keeps the luckiest negative-jitter sample
        and overstates throughput (observed: a physically impossible
        6.2 TB/s probe reading, and flagship sessions inflated ~25% at
        10 passes). The median is unbiased under symmetric jitter.
        """
        self._sync(self._chained(self.stream, 1))
        self._sync(self._chained(self.stream, 1 + passes))
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            self._sync(self._chained(self.stream, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            self._sync(self._chained(self.stream, 1 + passes))
            t2 = time.perf_counter() - t0
            samples.append((t2 - t1) / passes)
        ordered = sorted(samples)
        mid = len(ordered) // 2
        # True median: even rep counts average the middle pair (taking
        # the upper-middle alone systematically overstates the time).
        best = (ordered[mid] if len(ordered) % 2
                else (ordered[mid - 1] + ordered[mid]) / 2.0)
        if best <= 0.0:
            # Timing noise swamped the differencing (short runs on a loaded
            # host); fall back to the raw chained-run estimate.
            best = t2 / (1 + passes)
        return best

    def measure_throughput(self, passes: int = 10, reps: int = 3) -> dict:
        """Steady-state img/s via pass-count differencing, median of `reps`."""
        best = self._measure_per_pass(passes=passes, reps=reps)
        h, w, c = self.shape
        return {
            "per_pass_s": best,
            "img_per_s": self.num_images / best,
            "mpix_per_s": self.num_images * h * w / best / 1e6,
            "hbm_gb_per_s": 2 * self.num_images * h * w * c / best / 1e9,
        }
