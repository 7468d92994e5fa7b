"""Tracing, profiling, and structured metrics.

The reference's only observability is wall-clock prints and tqdm bars
(SURVEY.md §5). Here:

- ``step_timer``: wall-clock timing context that forces device completion
  (``block_until_ready`` on a supplied array) so timings are honest under
  JAX's async dispatch.
- ``profile_trace``: wraps ``jax.profiler`` traces (view in TensorBoard /
  xprof); no-ops cleanly if the backend can't trace.
- ``MetricsLogger``: JSON-lines metrics (loss, token-acc, images/sec, ...)
  to stdout and/or a file — machine-readable training/eval telemetry.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import IO, Optional

import jax


@contextlib.contextmanager
def step_timer(result_holder: dict, key: str = "seconds", sync=None):
    """Times the block; if ``sync`` (an array or pytree) is given, waits for
    it before stopping the clock."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    result_holder[key] = time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around the block (inspect with TensorBoard)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # tunnel backends may not support tracing
        print(f"profiler trace unavailable: {e}", file=sys.stderr)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class MetricsLogger:
    """JSON-lines metrics stream: one object per event."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._file: Optional[IO] = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.time()

    def log(self, event: str, **metrics):
        record = {"event": event, "t": round(time.time() - self._t0, 3)}
        record.update(
            {
                k: (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()
            }
        )
        line = json.dumps(record)
        if self._echo:
            print(line, flush=True)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
