"""Headline benchmark: batched greedy decode throughput on one TPU chip.

Task (matches BASELINE.json config #2, and the baseline measured from the
PyTorch reference on this host's CPU by tools/measure_reference_baseline.py):
flagship model (hybrid ResNet+ViT encoder at the (160, 1008) max canvas,
4-layer decoder), greedy decode for a FIXED 256 steps (EOS early-exit
disabled so the number is shape-honest), bfloat16 compute. Default batch
256 — the measured throughput knee (64 -> 198, 128 -> 243.5, 256 -> 262
img/s; RESULTS.md batch sweep); override with TEXOCR_BENCH_BATCH.

``vs_baseline`` is a throughput-over-throughput ratio against the PyTorch
reference measured on this host's CPU at ITS best practical batch (8,
~batch-linear there — bench_baseline.json); the JSON line records both
batches so the cross-batch comparison is explicit.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": x}
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

# Keep the CPU backend available for cheap host-side param init alongside
# whatever accelerator platform the environment selects.
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Persistent XLA compilation cache: reruns skip the ~100s compile.
from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from texocr_tpu.models import OCRModel  # noqa: E402
from texocr_tpu.models.generate import greedy_decode  # noqa: E402
from __graft_entry__ import _flagship_config  # noqa: E402

BATCH = int(os.environ.get("TEXOCR_BENCH_BATCH", "256"))
DECODE_STEPS = 256
H, W = 160, 1008


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"benchmark device: {dev}")

    import dataclasses

    model = OCRModel(
        dataclasses.replace(
            _flagship_config(max_length=512, dtype="bfloat16"),
            use_flash_attention=True,
            # Cross-KV int8: at batch 64 the dequant ops cost ~7% (183 vs
            # 196 img/s) because the KV DMA overlapped with compute. After
            # the split-cache fix removed the per-step DUS stalls, the b256
            # profile puts the 8 cross-attention K/V streams at 48% of
            # device time (1.3 GB/step bf16) — halving them now wins more
            # than the dequant costs. Override with TEXOCR_BENCH_KV_QUANT.
            kv_quant=os.environ.get("TEXOCR_BENCH_KV_QUANT", "int8"),
            # Self-attention merged-prefix int8 (see attention.merge_hot):
            # a measured LOSS in round 4 (full-width prefix reads: the
            # quant/dequant ops cost more than the saved bytes), flipped
            # to +3.7% once the tiered prefix reads cut the read width —
            # 371.6 vs 358.1 img/s at b256 (RESULTS.md round-5 tier A/B).
            # Override with TEXOCR_BENCH_SELF_KV_QUANT=none for bf16.
            self_kv_quant=os.environ.get("TEXOCR_BENCH_SELF_KV_QUANT",
                                         "int8"),
        )
    )

    # Init on CPU (shapes don't depend on the image size), transfer once.
    # Init uses a non-flash twin (identical param tree — the kernel has no
    # params) because the Pallas TPU kernel can't trace on the CPU backend.
    init_model = OCRModel(_flagship_config(max_length=512, dtype="bfloat16"))
    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        init_imgs = jnp.zeros((1, 32, 64, 1), jnp.float32)
        init_lbls = jnp.full((1, 8), 999, jnp.int32)
        params = init_model.init(jax.random.PRNGKey(0), init_imgs, init_lbls)
    params = jax.device_put(params, dev)
    log(f"param init: {time.time()-t0:.1f}s")

    # Distinct image batches per timed run: the tunnel runtime short-circuits
    # repeated executions on identical input buffers, which would fake the
    # timing (observed: 0.8ms "runs" on reused buffers vs ~2s on fresh ones).
    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            jnp.asarray(rng.random((BATCH, H, W, 1), dtype=np.float32)), dev
        )
        for _ in range(4)
    ]
    images = batches[0]

    cfg = model.config

    @jax.jit
    def decode(params, images):
        enc = model.apply(params, images, method=OCRModel.encode)
        tokens = greedy_decode(
            model,
            params,
            enc,
            bos_token=cfg.bos_token,
            eos_token=-1,  # disable early exit: fixed 256-step measurement
            pad_token=cfg.pad_token,
            max_len=DECODE_STEPS,
        )
        # Scalar checksum: forces full device execution before the (tiny)
        # host readback — block_until_ready alone is unreliable through the
        # TPU tunnel (reports readiness before execution completes).
        return jnp.sum(tokens)

    t0 = time.time()
    float(decode(params, images))
    log(f"compile + first run: {time.time()-t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.time()
        float(decode(params, batches[1 + i]))
        times.append(time.time() - t0)
    best = min(times)
    ips = BATCH / best
    log(f"runs: {[f'{t:.3f}s' for t in times]} -> {ips:.1f} images/sec")

    # TEXOCR_BENCH_PROFILE=<dir>: wrap one extra decode in a jax.profiler
    # trace of the exact shipped configuration (summarize the xplane with
    # tools/xplane_top.py). Off the timed path so it can't skew the numbers.
    profile_dir = os.environ.get("TEXOCR_BENCH_PROFILE")
    if profile_dir:
        from texocr_tpu.telemetry import profile_trace

        with profile_trace(profile_dir):
            float(decode(params, batches[1]))
        log(f"profile trace written to {profile_dir}")

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = None
    baseline_batch = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)
        vs = ips / baseline["value"]
        baseline_batch = baseline.get("batch")
        log(
            f"baseline: {baseline['value']:.3f} images/sec "
            f"({baseline['hardware']}, batch {baseline_batch}) -> {vs:.1f}x "
            "(throughput ratio across batch sizes)"
        )

    print(
        json.dumps(
            {
                "metric": f"batch{BATCH}_greedy_decode_256steps_images_per_sec",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "batch": BATCH,
                "baseline_batch": baseline_batch,
            }
        )
    )


if __name__ == "__main__":
    main()
