"""BASELINE.json config #4: beam-5 decode with KV cache at a 512-token budget.

Flagship model at the (160, 1008) max canvas, batch 8 (= 40 live beams),
beam_size 5, fixed 512 decode steps (EOS early-exit disabled via an
unreachable eos id so the number is shape-honest). Prints one JSON line.

Round-1 result (per-step full-cache jnp.take re-gather): 6.5 img/s.
"""

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

from texocr_tpu.models import OCRModel  # noqa: E402
from texocr_tpu.models.beam import beam_decode  # noqa: E402
from __graft_entry__ import _flagship_config  # noqa: E402

BEAM = 5
DECODE_STEPS = 512
H, W = 160, 1008


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import argparse
    import dataclasses

    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=str, default="8",
                   help="comma-separated batch sizes to sweep, e.g. 8,16,32")
    p.add_argument("--profile", type=str, default=None,
                   help="jax.profiler trace dir: wraps one extra decode per "
                        "batch size (summarize with tools/xplane_top.py)")
    p.add_argument("--kv_quant", type=str, default="int8",
                   choices=["none", "int8"],
                   help="cross-attention KV cache storage (default int8, "
                        "matching bench.py's shipped decode configuration)")
    p.add_argument("--self_kv_quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="self-attention merged-prefix storage (default "
                        "none, matching bench.py)")
    args = p.parse_args()
    batch_sizes = [int(b) for b in args.batches.split(",")]

    dev = jax.devices()[0]
    log(f"device: {dev}")
    model = OCRModel(
        dataclasses.replace(
            _flagship_config(max_length=DECODE_STEPS + 1, dtype="bfloat16"),
            use_flash_attention=jax.default_backend() == "tpu",
            kv_quant=args.kv_quant,
            self_kv_quant=args.self_kv_quant,
        )
    )
    log(f"kv_quant={args.kv_quant} self_kv_quant={args.self_kv_quant}")
    init_model = OCRModel(
        _flagship_config(max_length=DECODE_STEPS + 1, dtype="bfloat16")
    )
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 64, 1), jnp.float32),
            jnp.full((1, 8), 999, jnp.int32),
        )
    params = jax.device_put(params, dev)

    cfg = model.config
    rng = np.random.default_rng(0)

    @jax.jit
    def decode(params, images):
        enc = model.apply(params, images, method=OCRModel.encode)
        tokens = beam_decode(
            model,
            params,
            enc,
            bos_token=cfg.bos_token,
            eos_token=-1,  # fixed-length measurement
            pad_token=cfg.pad_token,
            max_len=DECODE_STEPS,
            beam_size=BEAM,
        )
        return jnp.sum(tokens)  # checksum forces full execution

    for batch in batch_sizes:
        batches = [
            jax.device_put(
                jnp.asarray(rng.random((batch, H, W, 1), dtype=np.float32)),
                dev,
            )
            for _ in range(4)
        ]
        t0 = time.time()
        float(decode(params, batches[0]))
        log(f"b{batch} compile + first run: {time.time()-t0:.1f}s")

        times = []
        for i in range(3):
            t0 = time.time()
            float(decode(params, batches[1 + i]))
            times.append(time.time() - t0)
        best = min(times)
        ips = batch / best
        log(f"b{batch} runs: {[f'{t:.3f}s' for t in times]} "
            f"-> {ips:.2f} images/sec")

        if args.profile:
            from texocr_tpu.telemetry import profile_trace

            with profile_trace(os.path.join(args.profile, f"b{batch}")):
                float(decode(params, batches[1]))

        print(
            json.dumps(
                {
                    "metric": (
                        f"batch{batch}_beam5_decode_512steps_images_per_sec"
                    ),
                    "value": round(ips, 2),
                    "unit": "images/sec/chip",
                    "vs_round1": round(ips / 6.5, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
