"""Concurrent-serving latency benchmark (BASELINE.json config #5).

Drives the micro-batching server with concurrent synthetic requests and
reports p50/p99 per-request latency + sustained throughput. Run on the TPU:
``python tools/bench_serving.py [--requests 128] [--concurrency 16]``.

``--http`` routes every request through the real HTTP stack
(serving/http_server.py on an ephemeral localhost port, urllib clients with
PNG-encoded bodies) instead of calling the batcher in-process, so the
reported latency includes encode/decode + socket overhead a web deployment
actually pays.
"""

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from texocr_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--max_len", type=int, default=128)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--http", action="store_true",
                   help="route requests through the HTTP server")
    p.add_argument("--mode", type=str, default="greedy",
                   choices=["greedy", "beam"],
                   help="decode mode (beam = beam-5)")
    p.add_argument("--kv_quant", type=str, default="int8",
                   choices=["none", "int8"],
                   help="cross-KV cache precision (int8 = the bench.py "
                        "default: +26%% greedy decode at b256, logits within "
                        "the rounding budget)")
    args = p.parse_args()

    from PIL import Image

    from texocr_tpu.serving import TexOCR
    from texocr_tpu.serving.batcher import ServingBatcher
    from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

    engine = TexOCR(
        {
            "tokenizer_path": DEFAULT_VOCAB_PATH,
            "patch_size": 16,
            "glu": True,
            "bos_token": 998,
            "eos_token": 997,
            "trg_pad_idx": 999,
            "max_length": 512,
            "dtype": "bfloat16",
            "kv_quant": args.kv_quant,
            "use_flash_attention": True,
            "encoder": {"n_channels": 1, "embed_dim": 256, "num_layers": 4,
                        "heads": 8},
            "decoder": {"embed_dim": 256, "num_layers": 4, "heads": 8,
                        "cross_attend": True, "dropout": 0.1, "exp_factor": 4},
        }
    )
    batcher = ServingBatcher(engine, max_batch=args.max_batch,
                             max_len=args.max_len, mode=args.mode)

    rng = np.random.default_rng(0)
    sizes = [(320, 96), (448, 96), (640, 160)]  # (w, h) render-rule canvases

    def make_img():
        w, h = sizes[rng.integers(len(sizes))]
        arr = np.full((h, w), 255, np.uint8)
        arr[rng.integers(0, h, 600), rng.integers(0, w, 600)] = 0
        return Image.fromarray(arr)

    images = [make_img() for _ in range(args.requests)]

    # Warm the compile cache: every (canvas, batch-size) pair.
    print("warming compile cache...", file=sys.stderr)
    t0 = time.time()
    batcher.warmup([(h, w) for (w, h) in sizes])
    print(f"warmup took {time.time()-t0:.0f}s", file=sys.stderr)

    server = None
    if args.http:
        import io
        import urllib.request

        from texocr_tpu.serving.http_server import make_server, serve_in_thread

        server = make_server(batcher, port=0)
        serve_in_thread(server)
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}/ocr"

        def encode(img):
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

        payloads = [encode(img) for img in images]

        def do_request(i):
            req = urllib.request.Request(url, data=payloads[i], method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                json.loads(r.read())
    else:
        def do_request(i):
            batcher(images[i])

    latencies = []
    t_start = time.time()

    def request(i):
        t0 = time.time()
        do_request(i)
        latencies.append(time.time() - t0)

    with ThreadPoolExecutor(max_workers=args.concurrency) as pool:
        list(pool.map(request, range(args.requests)))
    wall = time.time() - t_start

    lat = np.array(sorted(latencies))
    result = {
        "requests": args.requests,
        "concurrency": args.concurrency,
        "throughput_rps": round(args.requests / wall, 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1000, 1),
        "p99_ms": round(float(np.percentile(lat, 99)) * 1000, 1),
        "max_len": args.max_len,
        "mode": args.mode,
        "transport": "http" if args.http else "in-process",
    }
    if server is not None:
        server.shutdown()
    batcher.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
