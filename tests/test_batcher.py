"""ServingBatcher robustness: timeouts, shutdown ordering, warm flag.

Pure host-side tests with a stub engine — no model, no device. Covers the
server-side guarantees the HTTP front end relies on: a request queued past
request_timeout_s fails with TimeoutError instead of occupying the chip,
submit() after shutdown() raises instead of returning an orphaned future,
futures that raced into the queue around the shutdown sentinel are failed,
and the `warm` flag flips on warmup / first successful batch."""

import threading
import time

import numpy as np
import pytest

from texocr_tpu.serving.batcher import ServingBatcher


class _StubEngine:
    """Minimal TexOCR stand-in: identity preprocess, constant decode."""

    def __init__(self, delay_s: float = 0.0):
        self.delay_s = delay_s
        self.calls = 0

    def preprocess(self, img):
        arr = np.asarray(img, np.uint8)
        return arr.reshape((1,) + arr.shape + (1,))

    def generate_batch(self, canvases, max_len=350, temp=0.3, mode="greedy",
                       **kw):
        self.calls += 1
        if self.delay_s:
            time.sleep(self.delay_s)
        return np.full((canvases.shape[0], 4), 997, np.int32)

    def postprocess(self, row):
        return [int(t) for t in row], "x"


def _img(h=8, w=8):
    return np.full((h, w), 255, np.uint8)


def test_round_trip_and_warm_flag():
    eng = _StubEngine()
    b = ServingBatcher(eng, max_batch=2, max_wait_ms=1.0)
    assert b.warm is False
    tokens, latex = b.submit(_img()).result(timeout=10)
    assert latex == "x" and len(tokens) == 4
    assert b.warm is True
    b.shutdown()


def test_warmup_sets_warm():
    eng = _StubEngine()
    b = ServingBatcher(eng, max_batch=2)
    b.warmup([(8, 8)])
    assert b.warm is True
    assert eng.calls == len(b.batch_sizes)  # one compile per batch size
    b.shutdown()


def test_submit_after_shutdown_raises():
    b = ServingBatcher(_StubEngine(), max_batch=2)
    b.shutdown()
    with pytest.raises(RuntimeError):
        b.submit(_img())


def test_request_timeout_expires_stale_requests():
    # Worker is busy for ~0.5s on the first request; the second request
    # waits in the queue past its 0.05s budget and must get TimeoutError.
    eng = _StubEngine(delay_s=0.5)
    b = ServingBatcher(eng, max_batch=1, max_wait_ms=0.0,
                       request_timeout_s=0.05)
    first = b.submit(_img())
    time.sleep(0.1)  # let the worker pick up `first` alone (max_batch=1)
    second = b.submit(_img())
    assert first.result(timeout=10)[1] == "x"
    with pytest.raises(TimeoutError):
        second.result(timeout=10)
    b.shutdown()


def test_shutdown_fails_queued_futures():
    # Stall the worker, queue a request behind it, shut down: the queued
    # future must resolve (with an error), not hang.
    eng = _StubEngine(delay_s=0.5)
    b = ServingBatcher(eng, max_batch=1, max_wait_ms=0.0)
    b.submit(_img())
    time.sleep(0.1)
    late = b.submit(_img())
    shut = threading.Thread(target=b.shutdown)
    shut.start()
    # Either the worker drains it before exiting (result) or shutdown fails
    # it (RuntimeError) — it must not block.
    try:
        late.result(timeout=10)
    except RuntimeError:
        pass
    shut.join(timeout=10)
    assert not shut.is_alive()
