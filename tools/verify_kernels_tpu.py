"""On-hardware kernel cross-check: Pallas flash attention vs XLA attention.

The unit tests validate the kernel in Pallas INTERPRETER mode on CPU; this
tool runs the compiled kernel on the actual chip and asserts numeric
agreement with the XLA path at the model's real shapes:

- encoder self-attention: (B, 8, 631, 64) non-causal (the (160,1008) canvas)
- decoder teacher-forced self-attention: causal, N=512
- tail-padded batch via kv_lens

Run: ``python tools/verify_kernels_tpu.py``. Prints one JSON line per case
and exits nonzero on any mismatch. Results recorded in RESULTS.md.
"""

import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp


sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from texocr_tpu.ops.attention_core import xla_attention  # noqa: E402
from texocr_tpu.ops.flash_attention import flash_attention  # noqa: E402

# bf16 inputs: kernel and XLA both upcast scores/softmax to f32, but the
# p @ v contraction happens in bf16 on both paths; small elementwise wobble
# from different contraction orders is expected. f32 inputs: TPU matmuls
# default to bf16-pass MXU execution (jax default_matmul_precision), so the
# two paths agree to ~1e-4, not f32 epsilon (measured 1.7e-4 on v5e).
TOL = {"bfloat16": 2e-2, "float32": 1e-3}


def run_case(name, b, h, n, dh, dtype, causal, kv_lens=None):
    rng = np.random.default_rng(hash(name) % 2**32)
    q = jnp.asarray(rng.normal(size=(b, h, n, dh)), dtype)
    k = jnp.asarray(rng.normal(size=(b, h, n, dh)), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, n, dh)), dtype)
    scale = dh**-0.5

    flash = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, scale=scale, causal=causal, kv_lens=kv_lens
        )
    )(q, k, v)
    allowed = None
    if kv_lens is not None:
        key_ok = jnp.arange(n)[None, :] < kv_lens[:, None]  # (B, Nk)
        allowed = jnp.broadcast_to(key_ok[:, None, None, :], (b, 1, n, n))
    ref = jax.jit(
        lambda q, k, v: xla_attention(
            q, k, v, scale=scale, causal=causal, allowed=allowed
        )
    )(q, k, v)

    flash, ref = np.asarray(flash, np.float32), np.asarray(ref, np.float32)
    err = np.abs(flash - ref)
    denom = np.maximum(np.abs(ref), 1.0)
    rel = err / denom
    if kv_lens is not None:
        # A batch element with kv_len == 0 has every key masked: softmax is
        # degenerate on both paths but with different fill conventions.
        # Compare only elements with at least one live key.
        rel = rel[np.asarray(kv_lens) > 0]
    rel = rel.max() if rel.size else 0.0
    ok = bool(rel < TOL[dtype])
    print(
        json.dumps(
            {
                "case": name,
                "shape": [b, h, n, dh],
                "dtype": dtype,
                "causal": causal,
                "max_rel_err": float(rel),
                "tol": TOL[dtype],
                "ok": ok,
                "backend": jax.default_backend(),
            }
        ),
        flush=True,
    )
    return ok


def main():
    cases = [
        ("encoder_631_bf16", 8, 8, 631, 64, "bfloat16", False, None),
        ("encoder_631_f32", 4, 8, 631, 64, "float32", False, None),
        ("causal_512_bf16", 8, 8, 512, 64, "bfloat16", True, None),
        ("kv_lens_tail_pad", 4, 8, 640, 64, "float32", False,
         jnp.asarray([640, 631, 500, 257], jnp.int32)),
    ]
    ok = all(run_case(*c[:7], kv_lens=c[7]) for c in cases)
    if jax.default_backend() == "cpu":
        print(json.dumps({"warning": "ran on CPU (interpret mode), not TPU"}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
