#!/usr/bin/env python
"""MFU report: FLOPs, device time, and % of peak for each execution phase.

Measures the three phases that matter on the chip — encoder forward, the
device-resident train step (per shape bucket), and fixed-length greedy
decode — and reports model FLOPs utilization against the v5e bf16 peak.
FLOPs come from XLA's own cost model (``compiled.cost_analysis()['flops']``),
not hand math, so the numerator is what the compiler actually scheduled.

Timing follows the tunnel-safe pattern from bench.py: fresh (or chained)
inputs per run and a scalar checksum readback to force completion —
`block_until_ready` alone is unreliable through the TPU tunnel, and
repeated identical inputs get short-circuited by the tunnel runtime.
The train step chains state by construction (donated TrainState).

Run on the chip:   python tools/mfu_report.py
Prints one JSON line per phase and a markdown table on stderr.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import optax  # noqa: E402

from __graft_entry__ import _flagship_config  # noqa: E402
from texocr_tpu.models import OCRModel  # noqa: E402
from texocr_tpu.models.generate import greedy_decode  # noqa: E402
from texocr_tpu.training.device_data import make_scan_train_step  # noqa: E402
from texocr_tpu.training.train_step import TrainState  # noqa: E402

PEAK_BF16 = 197e12  # TPU v5e per-chip bf16 peak (jax-ml scaling book)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def cpu_init_params(max_length: int):
    init_model = OCRModel(_flagship_config(max_length=max_length,
                                           dtype="bfloat16"))
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 64, 1), jnp.float32),
            jnp.full((1, 8), 999, jnp.int32),
        )
    return jax.device_put(params, jax.devices()[0])


def time_runs(fn, fresh_args, n=3):
    """fn(*args) -> scalar checksum; returns best wall seconds over n runs
    with distinct inputs (tunnel short-circuits repeats)."""
    times = []
    for args in fresh_args[:n]:
        t0 = time.time()
        float(fn(*args))
        times.append(time.time() - t0)
    return min(times), times


def time_pipelined(fn, fresh_args):
    """Sustained per-call seconds: dispatch every call asynchronously, force
    all results once at the end. Back-to-back dispatch overlaps the tunnel's
    per-call round-trip with device compute, so this is the steady-state
    throughput number; time_runs is the single-shot latency number."""
    t0 = time.time()
    outs = [fn(*args) for args in fresh_args]
    for o in outs:
        float(o)
    return (time.time() - t0) / len(fresh_args)


def matmul_param_count(tree) -> int:
    """Total elements of >=2-D parameter leaves (matmul weights; skips
    biases/norm scales — and callers exclude embedding tables by name)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = jax.tree_util.keystr(path).lower()
        if leaf.ndim >= 2 and "embed" not in name and "pos" not in name:
            total += leaf.size
    return total


def phase_encoder(model, params, results):
    B, H, W = 64, 160, 1008
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    @jax.jit
    def enc_fwd(params, images):
        return jnp.sum(
            model.apply(params, images, method=OCRModel.encode)
            .astype(jnp.float32))

    batches = [
        jax.device_put(jnp.asarray(
            rng.random((B, H, W, 1), dtype=np.float32)), dev)
        for _ in range(4)
    ]
    compiled = enc_fwd.lower(params, batches[0]).compile()
    fl = flops_of(compiled)
    float(enc_fwd(params, batches[0]))  # warm
    best, times = time_runs(enc_fwd, [(params, b) for b in batches[1:]])
    piped = time_pipelined(enc_fwd, [(params, b) for b in batches[1:]])
    results.append({
        "phase": f"encoder fwd b{B} ({H},{W})",
        "flops_per_call": fl,
        "seconds": piped,
        "single_shot_s": best,
        "tflops_per_sec": fl / piped / 1e12,
        "mfu_pct": 100 * fl / piped / PEAK_BF16,
        "images_per_sec": B / piped,
        "all_runs_s": [round(t, 4) for t in times],
    })
    return fl


def phase_train(model, h, w, seq_len, results, batch=32, steps=16,
                n_images=1024):
    """Device-resident scan train step on a synthetic (h, w) bucket."""
    dev = jax.devices()[0]
    rng = np.random.default_rng(1)
    # Lane-padded pool, matching the shipped resident-bucket contract
    # (device_data.LANE): minor dims stored as multiples of the 128-lane
    # vector width so the on-device gather is zero-copy; the step crops the
    # gathered BATCH back to the logical (w, seq_len).
    from texocr_tpu.training.device_data import LANE

    wp = -(-w // LANE) * LANE
    lp = -(-seq_len // LANE) * LANE
    images_np = np.full((n_images, h, wp), 255, dtype=np.uint8)
    images_np[:, :, :w] = rng.integers(
        0, 256, (n_images, h, w), dtype=np.uint8)
    images_u8 = jax.device_put(jnp.asarray(images_np), dev)
    labels_np = np.full((n_images, lp), 999, dtype=np.int32)
    labels_np[:, :seq_len] = rng.integers(0, 900, (n_images, seq_len))
    labels_np[:, 0] = 998
    labels_np[:, seq_len - 1] = 999
    labels = jax.device_put(jnp.asarray(labels_np), dev)

    tx = optax.adam(3e-4)
    # TrainState.params is the INNER dict (the train step wraps it back in
    # {"params": ...} at apply time — device_data.py:285).
    params = cpu_init_params(max_length=seq_len)["params"]
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.int32(0),
        dropout_rng=jax.random.PRNGKey(0))
    run = make_scan_train_step(model, tx, batch, mask_pad=True,
                               steps_cap=steps)

    args = (state, images_u8, labels, jnp.int32(steps), jnp.int32(n_images),
            jnp.int32(0), jnp.int32(0), 0, w, seq_len)
    compiled = run.lower(*args).compile()
    # XLA's cost model counts a loop body ONCE (scan lowers to while, whose
    # trip count the model doesn't multiply), so the reported flops are one
    # scan-body execution = one train step; the call runs `steps` of them.
    fl = flops_of(compiled) * steps

    # Donated state chains the runs; vary start so index math isn't reused.
    state, metrics = run(*args)
    float(metrics["loss"])  # force
    times = []
    for i in range(3):
        t0 = time.time()
        state, metrics = run(state, images_u8, labels, jnp.int32(steps),
                             jnp.int32(n_images), jnp.int32(steps * (i + 1)),
                             jnp.int32(0), 0, w, seq_len)
        float(metrics["loss"])
        times.append(time.time() - t0)
    best = min(times)
    results.append({
        "phase": f"train step b{batch} ({h},{w}) seq{seq_len} "
                 f"[{steps} steps/call]",
        "flops_per_call": fl,
        "seconds": best,
        "tflops_per_sec": fl / best / 1e12,
        "mfu_pct": 100 * fl / best / PEAK_BF16,
        "images_per_sec": batch * steps / best,
        "all_runs_s": [round(t, 4) for t in times],
    })


def _decoder_attn_inner(dec_params) -> int:
    """Attention inner dim (heads*dim_head) read off a q-projection kernel's
    output axis, so the FLOP model tracks the real model config rather than
    a hardcoded 512."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(dec_params)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        if len(keys) >= 2 and keys[-2] == "q" and keys[-1] == "kernel":
            return int(leaf.shape[-1])
    raise ValueError("no q/kernel found in decoder params")


def decoder_step_flops(params, t_cache: int, t_enc: int,
                       num_layers: int = 4) -> float:
    """Analytic per-token decoder FLOPs (one KV-cached decode step, batch 1).

    XLA's cost model counts the decode while/scan bodies once, so the
    compiled flops can't be trusted for the loop; matmul flops are 2*params
    touched per token, plus the attention score/value contractions against
    the self-attention cache (t_cache rows) and the encoder memory (t_enc).
    """
    dec = {k: v for k, v in params["params"].items() if "decoder" in k.lower()}
    dense = 2 * matmul_param_count(dec)
    attn = num_layers * 4 * _decoder_attn_inner(dec) * (t_cache + t_enc)
    return float(dense + attn)


def phase_decode(model, params, results, enc_flops):
    B, H, W, STEPS = 64, 160, 1008, 256
    cfg = model.config
    rng = np.random.default_rng(2)
    dev = jax.devices()[0]

    @jax.jit
    def decode(params, images):
        enc = model.apply(params, images, method=OCRModel.encode)
        tokens = greedy_decode(
            model, params, enc, bos_token=cfg.bos_token, eos_token=-1,
            pad_token=cfg.pad_token, max_len=STEPS)
        return jnp.sum(tokens)

    batches = [
        jax.device_put(jnp.asarray(
            rng.random((B, H, W, 1), dtype=np.float32)), dev)
        for _ in range(4)
    ]
    compiled = decode.lower(params, batches[0]).compile()
    # Encoder flops from the cost model (loop-free, trustworthy at this
    # batch) + analytic KV-cached decoder step flops x steps (see
    # decoder_step_flops); the raw cost-model total is kept for reference.
    # t_enc comes from an abstract trace of the encoder (631 for the
    # (160,1008) canvas: 10*63 patches + CLS) so canvas/patch-size changes
    # propagate into the FLOP model.
    t_enc = jax.eval_shape(
        lambda p, im: model.apply(p, im, method=OCRModel.encode),
        params, jax.ShapeDtypeStruct((B, H, W, 1), jnp.float32)).shape[1]
    fl = enc_flops + B * STEPS * decoder_step_flops(
        params, t_cache=STEPS, t_enc=t_enc,
        num_layers=cfg.decoder.num_layers)
    float(decode(params, batches[0]))
    best, times = time_runs(decode, [(params, b) for b in batches[1:]])
    piped = time_pipelined(decode, [(params, b) for b in batches[1:]])
    results.append({
        "phase": f"greedy decode b{B} ({H},{W}) {STEPS} steps (incl. enc)",
        "flops_per_call": fl,
        "flops_costmodel_raw": flops_of(compiled),
        "seconds": piped,
        "single_shot_s": best,
        "tflops_per_sec": fl / piped / 1e12,
        "mfu_pct": 100 * fl / piped / PEAK_BF16,
        "images_per_sec": B / piped,
        "all_runs_s": [round(t, 4) for t in times],
    })


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--skip_typeset", action="store_true",
                   help="skip the remat typeset-regime train row")
    args = p.parse_args()

    log(f"device: {jax.devices()[0]}")
    results = []

    model = OCRModel(dataclasses.replace(
        _flagship_config(max_length=512, dtype="bfloat16"),
        use_flash_attention=jax.default_backend() == "tpu"))
    params = cpu_init_params(max_length=512)

    enc_flops = phase_encoder(model, params, results)
    # The two bucket regimes that matter: the dominant realistic-mix bucket
    # and the full reference canvas (VERDICT weak #6: the worst-case
    # sustained number was unmeasured).
    phase_train(model, 96, 1008, 512, results)
    phase_train(model, 160, 1008, 512, results, n_images=512)
    if not args.skip_typeset:
        # The typeset-curriculum regime (stages U/V): tall (160,1008)
        # buckets at seq 640 with remat — the shapes that OOM'd without
        # rematerialization. Measures remat's FLOP/HBM trade directly.
        model_t = OCRModel(dataclasses.replace(
            _flagship_config(max_length=640, dtype="bfloat16"),
            use_flash_attention=jax.default_backend() == "tpu",
            remat=True, remat_prevent_cse=False))
        phase_train(model_t, 160, 1008, 640, results, n_images=512)
        results[-1]["phase"] += " [remat, typeset regime]"
    phase_decode(model, params, results, enc_flops)

    log("| phase | GFLOPs/call | time | TFLOP/s | % v5e bf16 peak | img/s |")
    log("|---|---|---|---|---|---|")
    for r in results:
        log(f"| {r['phase']} | {r['flops_per_call']/1e9:,.1f} | "
            f"{r['seconds']*1e3:.1f} ms | {r['tflops_per_sec']:.1f} | "
            f"{r['mfu_pct']:.1f}% | {r['images_per_sec']:.1f} |")
        print(json.dumps({k: v for k, v in r.items()}), flush=True)


if __name__ == "__main__":
    main()
