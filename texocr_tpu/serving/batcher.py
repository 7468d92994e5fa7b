"""Micro-batching serving loop.

The reference serves one image per call (TeXOCRWrapper, ocr_model.py:94).
On TPU, per-request decode wastes the chip: this batcher collects concurrent
requests, groups them by bucket canvas (the preprocess pads every image onto
a small set of canvas shapes), pads each group to a fixed batch size (powers
of two, so each (canvas, batch) pair compiles once), runs the jitted
encode+decode, and resolves per-request futures.

Usage:
    engine = TexOCR(config)
    batcher = ServingBatcher(engine, max_batch=16)
    fut = batcher.submit(pil_image)          # concurrent callers
    tokens, latex = fut.result()
    batcher.shutdown()
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Tuple

import numpy as np

from texocr_tpu.models import generate as _generate
from texocr_tpu.serving.wrapper import TexOCR


class ServingBatcher:
    def __init__(
        self,
        engine: TexOCR,
        max_batch: int = 16,
        max_wait_ms: float = 5.0,
        max_len: int = 350,
        mode: str = "greedy",
        batch_sizes: Optional[Tuple[int, ...]] = None,
        request_timeout_s: Optional[float] = None,
        prefix_tiers: Optional[int] = 1,
    ):
        self.engine = engine
        # Serving defaults to a SINGLE prefix-read tier: the tier ladder
        # (models/generate.py PREFIX_TIERS) multiplies every
        # (canvas, batch, mode) executable by the tier count — measured as a
        # multi-fold warmup-compile blowup for a serving instance that warms
        # 6+ shapes — while its HBM savings only show on long offline
        # decodes, not the short request budgets served here. Results are
        # bit-identical either way. Pass prefix_tiers=None to leave the
        # process-wide setting alone; TEXOCR_PREFIX_TIERS (set before
        # launch) always wins.
        if prefix_tiers is not None and "TEXOCR_PREFIX_TIERS" not in os.environ:
            _generate.PREFIX_TIERS = prefix_tiers
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.max_len = max_len
        self.mode = mode
        # Server-side guard against requests stuck behind a long compile or
        # a stalled device: a request older than this when its batch forms
        # fails with TimeoutError instead of occupying the chip.
        self.request_timeout_s = request_timeout_s
        # Flipped by warmup() / the first successful batch; the HTTP front
        # end reports it on /healthz and can 503 until warm.
        self.warm = False
        # Every padded batch size is a separate XLA compile per canvas; keep
        # the set tiny (solo requests + full batches) so compiles are bounded
        # and can all be warmed up front.
        self.batch_sizes = tuple(sorted(batch_sizes or (1, max_batch)))
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _padded_size(self, n: int) -> int:
        for s in self.batch_sizes:
            if n <= s:
                return s
        return self.batch_sizes[-1]

    def warmup(self, canvas_shapes) -> None:
        """Compile every (canvas, batch size) pair up front so no request
        pays a compile. ``canvas_shapes``: iterable of (H, W)."""
        for h, w in canvas_shapes:
            for n in self.batch_sizes:
                canvases = np.full((n, h, w, 1), 255, np.uint8)
                # np.asarray blocks until compile + execution finish (the
                # call itself returns a lazy device array).
                np.asarray(
                    self.engine.generate_batch(
                        canvases, max_len=self.max_len, mode=self.mode
                    )
                )
        self.warm = True

    def submit(self, img) -> Future:
        """Enqueue a PIL image; the future resolves to (tokens, latex).

        Raises RuntimeError once shutdown() has been called — there is no
        worker left to resolve the future."""
        if self._stop.is_set():
            raise RuntimeError("ServingBatcher is shut down")
        fut: Future = Future()
        canvas = self.engine.preprocess(img)  # (1, H, W, 1) on a bucket canvas
        self._q.put((canvas, fut, time.monotonic()))
        return fut

    def __call__(self, img) -> Tuple[list, str]:
        return self.submit(img).result()

    def shutdown(self):
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=5)
        # Fail anything that raced into the queue around the sentinel so no
        # caller blocks forever on an orphaned future.
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(
                    RuntimeError("ServingBatcher shut down before decode")
                )

    # -- worker ----------------------------------------------------------------

    def _drain(self):
        """Block for one request, then greedily take up to max_batch more
        within the wait window."""
        first = self._q.get()
        if first is None:
            return None
        items = [first]
        deadline = self.max_wait
        t0 = time.monotonic()
        while len(items) < self.max_batch:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                return items  # shutdown after this batch
            items.append(item)
        return items

    def _expire(self, items):
        """Fail requests that have already waited past request_timeout_s."""
        if self.request_timeout_s is None:
            return items
        now = time.monotonic()
        live = []
        for canvas, fut, t_in in items:
            if now - t_in > self.request_timeout_s:
                fut.set_exception(
                    TimeoutError(
                        f"request waited {now - t_in:.1f}s "
                        f"(> {self.request_timeout_s}s) before decode"
                    )
                )
            else:
                live.append((canvas, fut, t_in))
        return live

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if items is None:
                return
            items = self._expire(items)
            # Group by canvas shape: same-bucket requests batch together.
            groups = {}
            for canvas, fut, _ in items:
                groups.setdefault(canvas.shape[1:3], []).append((canvas, fut))
            for shape, group in groups.items():
                canvases = np.concatenate([c for c, _ in group], axis=0)
                n = canvases.shape[0]
                padded_n = self._padded_size(n)
                if padded_n > n:
                    filler = np.zeros(
                        (padded_n - n,) + canvases.shape[1:], canvases.dtype
                    )
                    canvases = np.concatenate([canvases, filler])
                try:
                    tokens = np.asarray(
                        self.engine.generate_batch(
                            canvases, max_len=self.max_len, mode=self.mode
                        )
                    )
                    self.warm = True
                    for row, (_, fut) in zip(tokens[:n], group):
                        fut.set_result(self.engine.postprocess(row))
                except Exception as e:  # propagate to all waiters
                    for _, fut in group:
                        if not fut.done():
                            fut.set_exception(e)
