"""HTTP serving front end: request/response contract over a real socket.

Drives texocr_tpu/serving/http_server.py end to end with a tiny model —
binds to an ephemeral localhost port, posts real PNG bytes with urllib, and
checks the JSON contract plus the error paths (bad body, wrong route)."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from texocr_tpu.tokenizer import DEFAULT_VOCAB_PATH

from tests.tiny import TINY_CONFIG


@pytest.fixture(scope="module")
def server_url():
    from PIL import Image  # noqa: F401  (engine preprocess needs PIL anyway)

    from texocr_tpu.serving import TexOCR
    from texocr_tpu.serving.batcher import ServingBatcher
    from texocr_tpu.serving.http_server import make_server, serve_in_thread

    cfg = dict(TINY_CONFIG)
    cfg.update(
        img_size=(32, 128),
        vocab_size=1000,
        trg_pad_idx=999,
        bos_token=998,
        eos_token=997,
        tokenizer_path=DEFAULT_VOCAB_PATH,
        max_length=64,
    )
    engine = TexOCR(cfg)
    batcher = ServingBatcher(engine, max_batch=4, max_len=6)
    server = make_server(batcher, port=0)  # ephemeral port
    serve_in_thread(server)
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    batcher.shutdown()


def _png_bytes(h=30, w=100):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((h, w), 255, np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["mode"] == "greedy"
    assert payload["max_batch"] == 4


def test_ocr_post_round_trip(server_url):
    req = urllib.request.Request(
        f"{server_url}/ocr", data=_png_bytes(),
        headers={"Content-Type": "image/png"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        payload = json.loads(r.read())
    assert isinstance(payload["tokens"], list)
    assert all(isinstance(t, int) for t in payload["tokens"])
    assert isinstance(payload["latex"], str)


def test_ocr_concurrent_requests_batch(server_url):
    """Concurrent posts all resolve (micro-batcher groups them)."""
    from concurrent.futures import ThreadPoolExecutor

    def post(_):
        req = urllib.request.Request(
            f"{server_url}/ocr", data=_png_bytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(post, range(4)))
    assert len(results) == 4
    assert all("latex" in p for p in results)


def test_bad_image_is_400(server_url):
    req = urllib.request.Request(
        f"{server_url}/ocr", data=b"this is not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())


def test_empty_body_is_400(server_url):
    req = urllib.request.Request(
        f"{server_url}/ocr", data=b"", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_unknown_route_is_404(server_url):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{server_url}/nope", timeout=30)
    assert exc.value.code == 404


def test_error_paths_close_keepalive_connection(server_url):
    """Error responses that skip reading the body must close the connection:
    otherwise the unread body bytes desync the next request on a reused
    HTTP/1.1 connection (requests.Session, load balancers)."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(server_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
    try:
        conn.request("POST", "/nope", body=b"x" * 1024,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 404
        assert resp.getheader("Connection") == "close"
        resp.read()
    finally:
        conn.close()


def test_healthy_post_keeps_connection_alive(server_url):
    """Two requests over ONE connection: the happy path consumes the body,
    so keep-alive must survive and the second request must parse cleanly."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(server_url)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=120)
    try:
        for _ in range(2):
            conn.request("POST", "/ocr", body=_png_bytes(),
                         headers={"Content-Type": "image/png"})
            resp = conn.getresponse()
            assert resp.status == 200
            payload = json.loads(resp.read())
            assert "latex" in payload
    finally:
        conn.close()


def test_503_until_warm():
    """require_warm servers reject /ocr with 503 while batcher.warm is
    False and open up once it flips."""
    import types

    from texocr_tpu.serving.http_server import make_server, serve_in_thread

    stub = types.SimpleNamespace(warm=False, mode="greedy", max_len=6,
                                 max_batch=4)
    server = make_server(stub, port=0, require_warm=True)
    serve_in_thread(server)
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        req = urllib.request.Request(f"{url}/ocr", data=b"zz", method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 503
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            assert json.loads(r.read())["warm"] is False
    finally:
        server.shutdown()
