"""Fused decode -> filter -> encode serving pipeline (BASELINE config 5).

The reference's full data path is JPEG decode (CImg) -> device blur ->
optional JPEG encode (`/root/reference/split_image_blur.c:106-139,548-553`).
This module is that path as a streaming service: batched multithreaded native
JPEG decode (hipe_tpu.io_.jpeg), device filtering (Pallas on TPU), and
multithreaded JPEG encode, with decode of batch k+1 prefetched while the
device processes batch k (double buffering, the TPU analog of the
reference's async write/kernel/read overlap). Handles mixed-resolution
streams: jitted device functions are cached per input shape.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import numpy as np

import jax

from hipe_tpu.models import pipelines as plib
from hipe_tpu.profiling.events import now_ms


@dataclasses.dataclass
class ServeStats:
    images: int = 0
    decode_ms: float = 0.0
    device_ms: float = 0.0
    encode_ms: float = 0.0
    wall_ms: float = 0.0

    @property
    def img_per_s(self) -> float:
        return self.images / (self.wall_ms / 1000.0) if self.wall_ms else 0.0


class ServingPipeline:
    """decode -> filter -> encode with decode/compute overlap."""

    def __init__(
        self,
        pipeline: plib.Pipeline | str = "blur3",
        *,
        device=None,
        quality: int = 90,
        decode_threads: int | None = None,
        use_pallas: bool | None = None,
    ):
        self.pipeline = plib.get(pipeline) if isinstance(pipeline, str) else pipeline
        self.device = device or jax.devices()[0]
        self.quality = quality
        self.decode_threads = decode_threads
        if use_pallas is None:
            use_pallas = getattr(self.device, "platform", "cpu") != "cpu"
        self.use_pallas = use_pallas
        self._fns: dict[tuple, callable] = {}
        self._pool = ThreadPoolExecutor(max_workers=4)
        self.stats = ServeStats()

    def _device_fn(self, shape: tuple):
        """Per-shape jitted NHWC filter (planar Pallas path on TPU)."""
        if shape not in self._fns:
            pipe, pallas_flag = self.pipeline, self.use_pallas
            channels = shape[3]

            def fn(rows):
                # The staged input is dead after the call: donate it and run
                # the Pallas kernel in place (~2x DMA, see ops.pallas_blur).
                return pipe.apply_rows(rows, channels,
                                       use_pallas=pallas_flag,
                                       alias=pallas_flag)

            self._fns[shape] = jax.jit(
                fn, donate_argnums=0 if pallas_flag else ()
            )
        return self._fns[shape]

    def _decode(self, payloads: list[bytes]) -> np.ndarray:
        from hipe_tpu.io_.jpeg import decode_batch

        t0 = now_ms()
        batch = decode_batch(payloads, num_threads=self.decode_threads)
        self.stats.decode_ms += now_ms() - t0
        return batch

    def _filter_device(self, batch: np.ndarray) -> np.ndarray:
        t0 = now_ms()
        b, h, w, c = batch.shape
        # Rows layout on device (free host reshape; avoids NHWC lane padding)
        rows = jax.device_put(batch.reshape(b, h, w * c), self.device)
        out = np.asarray(self._device_fn(batch.shape)(rows))
        self.stats.device_ms += now_ms() - t0
        return out.reshape(b, h, w, c)

    def _encode(self, batch: np.ndarray) -> list[bytes]:
        from hipe_tpu.io_.jpeg import encode_bytes

        t0 = now_ms()
        out = list(
            self._pool.map(lambda im: encode_bytes(im, self.quality), batch)
        )
        self.stats.encode_ms += now_ms() - t0
        return out

    def process_batch(self, payloads: list[bytes],
                      encode: bool = True) -> list[bytes] | np.ndarray:
        """Synchronous single batch: decode -> filter -> (encode)."""
        filtered = self._filter_device(self._decode(payloads))
        return self._encode(filtered) if encode else filtered

    def run(self, payload_batches: Iterable[list[bytes]],
            encode: bool = True) -> Iterator[list[bytes] | np.ndarray]:
        """Streaming mode: decode of batch k+1 overlaps device batch k."""
        t_start = now_ms()
        it = iter(payload_batches)
        pending = None
        for payloads in it:
            fut = self._pool.submit(self._decode, payloads)
            if pending is not None:
                batch = pending.result()
                self.stats.images += len(batch)
                filtered = self._filter_device(batch)
                yield self._encode(filtered) if encode else filtered
            pending = fut
        if pending is not None:
            batch = pending.result()
            self.stats.images += len(batch)
            filtered = self._filter_device(batch)
            yield self._encode(filtered) if encode else filtered
        self.stats.wall_ms += now_ms() - t_start
