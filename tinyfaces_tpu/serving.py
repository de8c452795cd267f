"""Production serving: dynamic-batching detection service.

The reference has no serving story (per-image scripts only). This service
wraps PyramidDetector's fused async path with request coalescing:

  * callers submit images from any thread and get a Future;
  * a dispatcher thread groups pending requests into device batches
    (same-bucket images together, padded to the bucket batch) under a
    max-batch / max-latency policy;
  * batches are enqueued with detect_batch_async so host prep and H2D of
    the next batch overlap device compute of the current one.

Throughput scales with the fused program's batched rate (bench.py) while
per-request latency stays bounded by `max_delay_ms`.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

from tinyfaces_tpu.evaluation import PyramidDetector, _round_up


class DetectionService:
    def __init__(
        self,
        detector: PyramidDetector,
        # Throughput rises ~10% from 16 -> 32 and ~19% -> 64 by amortizing
        # per-dispatch overhead (docs/PERF.md batch-scaling table), at
        # proportionally higher per-batch latency; 16 favors p50 latency.
        max_batch: int = 16,
        max_delay_ms: float = 25.0,
        scales: Optional[Sequence[int]] = None,
        prob_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None,
    ):
        self.detector = detector
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1e3
        self.scales = scales
        self.prob_thresh = prob_thresh
        self.nms_thresh = nms_thresh

        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._dispatcher = threading.Thread(target=self._run, daemon=True)
        self._dispatcher.start()

    def submit(self, image) -> Future:
        """Enqueue one image; resolves to (N, 5) detections.

        Accepts (H, W, 3) uint8 arrays; under transfer="jpegdct" also raw
        JPEG bytes or DCTImage. Baseline-4:2:0/grayscale JPEG bytes stay
        raw (header-only dims probe here) and take the fused C++
        entropy-decode + pack at dispatch — half the host CPU of
        parse-then-pack. Other inputs are coerced on the caller's
        thread (GIL-free C++), parallel across client threads."""
        if getattr(self.detector, "transfer", "rgb").startswith("jpegdct"):
            from tinyfaces_tpu.data.jpegdct import as_dct_image, jpeg_dims

            if isinstance(image, (bytes, bytearray, memoryview)):
                if jpeg_dims(bytes(image)) is None:
                    image = as_dct_image(image)  # transcode fallback
            else:
                image = as_dct_image(image)
        fut: Future = Future()
        self._queue.put((image, fut))
        return fut

    def detect(self, image: np.ndarray) -> np.ndarray:
        return self.submit(image).result()

    def close(self) -> None:
        self._stop.set()
        self._dispatcher.join(timeout=5)

    # -- dispatcher ----------------------------------------------------------

    def _drain_group(self) -> list:
        """Collect up to max_batch same-bucket requests within max_delay."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        group = [first]
        bucket = self._bucket(first[0])
        deadline = self.max_delay
        import time

        t0 = time.monotonic()
        leftovers = []
        while len(group) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if self._bucket(item[0]) == bucket:
                group.append(item)
            else:
                leftovers.append(item)
        for item in leftovers:  # different bucket: next round
            self._queue.put(item)
        return group

    @staticmethod
    def _bucket(image) -> tuple[int, int]:
        if hasattr(image, "h"):  # DCTImage
            return (_round_up(image.h), _round_up(image.w))
        if isinstance(image, (bytes, bytearray, memoryview)):
            from tinyfaces_tpu.data.jpegdct import jpeg_dims

            h, w = jpeg_dims(bytes(image))  # submit() guaranteed parseable
            return (_round_up(h), _round_up(w))
        return (_round_up(image.shape[0]), _round_up(image.shape[1]))

    def _resolve(self, entry) -> None:
        submitted, group = entry
        try:
            results = self.detector._fetch(submitted.result())
            for (_, fut), dets in zip(group, results):
                fut.set_result(dets)
        except Exception as e:
            for _, fut in group:
                fut.set_exception(e)

    @staticmethod
    def _pad_batch(images: list) -> list:
        """Pad a group to the next power of two by repeating the last image
        (surplus outputs discarded). Without this, every distinct group
        size that arrivals happen to produce compiles a NEW fused program
        — catastrophic over a remote-compile tunnel (400-900 s each). The
        ladder bounds the compile set to log2(max_batch)+1 programs."""
        n = 1
        while n < len(images):
            n *= 2
        return images + [images[-1]] * (n - len(images))

    def _run(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        # Two host stages (same structure as bench.py / the eval sweep):
        # pack (CPU-bound C++ decode+pack) and upload+dispatch
        # (network-bound, one worker to keep dispatch order). Packing
        # group i+1 in the dispatcher thread would serialize behind
        # group i's upload on a 1-core host.
        pack_pool = ThreadPoolExecutor(1)
        submit_pool = ThreadPoolExecutor(1)
        pending: list = []  # in-flight [(submitted_future, group)], depth <= 2
        while not self._stop.is_set() or not self._queue.empty() or pending:
            group = self._drain_group()
            if group:
                packed = pack_pool.submit(
                    self.detector.pack_inputs,
                    self._pad_batch([im for im, _ in group]))
                submitted = submit_pool.submit(
                    lambda p=packed: self.detector.detect_batch_async(
                        p.result(),
                        self.prob_thresh, self.nms_thresh, self.scales))
                pending.append((submitted, group))
            # keep pipeline depth 2: resolve the oldest batch when a newer
            # one is in flight, or when there is no new work to enqueue
            if pending and (len(pending) >= 2 or not group):
                self._resolve(pending.pop(0))
        pack_pool.shutdown(wait=False)
        submit_pool.shutdown(wait=False)
