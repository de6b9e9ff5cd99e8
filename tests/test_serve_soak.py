"""Serving soak: N concurrent clients x M requests each against the LIVE
server — DynamicBatcher coalescing, native request decode, /metrics
hammered under load, and a SIGTERM drain triggered mid-burst.

The pieces are individually tested in test_serve.py; this covers their
composition under concurrency (VERDICT r3 item 8): zero dropped or
cross-wired responses, and the drain path finishing in-flight work
before the batcher is torn down.  The reference has no serving layer at
all (SURVEY.md §5); Test.py:161 predicts one image at a time in-process.

A larger manual recipe (hundreds of clients against a real checkpoint on
the TPU) is documented in docs/SCALING.md §serving-soak.
"""
import io
import threading
import time
import urllib.error
import urllib.request

import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.eval import label_from_pred
from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
    _decode_request, _mask_to_png, _serve_until_stopped, make_server)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    TrainConfig)

SIZE = 32
N_CLIENTS = 6
M_REQUESTS = 4


def _png_bytes(rng) -> bytes:
    from PIL import Image

    img = Image.fromarray(
        (rng.uniform(size=(SIZE, SIZE, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def _post(base: str, body: bytes) -> bytes:
    req = urllib.request.Request(base + "/predict", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
        return resp.read()


def test_serving_soak_and_drain(tmp_path):
    cfg = TrainConfig(imlength=SIZE, imwidth=SIZE, num_channels=3,
                      decoder_name="UNet", model_width=4, model_depth=2,
                      output_nums=1, class_number=1,
                      save_dir=str(tmp_path))
    server = make_server(cfg, str(tmp_path / "Fold_1"), port=0,
                         max_batch=4)
    batcher = server.batcher
    assert batcher is not None  # the soak must ride the batcher path
    real_predictor = batcher.predictor

    # distinct per-client payloads + their ground-truth responses through
    # the SAME decode -> predict -> mask pipeline the handler uses, so a
    # cross-wired response under concurrency is a byte mismatch
    rng = np.random.default_rng(11)
    payloads = [_png_bytes(rng) for _ in range(N_CLIENTS)]
    expected = []
    for body in payloads:
        x = _decode_request(body, (SIZE, SIZE), cfg.image_color_mode,
                            cfg.normalizing_factor_img)
        label = label_from_pred(real_predictor(x[None])[0],
                                cfg.class_number, 0.5)
        expected.append(_mask_to_png(label, 2))

    # slow the device call slightly so concurrent requests genuinely
    # overlap inside the batcher on the single-core CI host
    batch_sizes = []

    class Delayed:
        max_batch = real_predictor.max_batch

        def __call__(self, batch):
            batch_sizes.append(batch.shape[0])
            time.sleep(0.01)
            return real_predictor(batch)

    batcher.predictor = Delayed()

    # the REAL drain path: _serve_until_stopped on a helper thread
    # (signal registration is skipped off the main thread)
    server_thread = threading.Thread(target=_serve_until_stopped,
                                     args=(server,), daemon=True)
    server_thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    # ---- phase A: the soak burst, with /metrics hammered in parallel
    failures = []

    def client(i):
        try:
            for _ in range(M_REQUESTS):
                if _post(base, payloads[i]) != expected[i]:
                    failures.append(f"client {i}: response mismatch")
        except Exception as e:  # noqa: BLE001 — recorded, not raised
            failures.append(f"client {i}: {e!r}")

    stop_metrics = threading.Event()

    def metrics_hammer():
        try:
            while not stop_metrics.is_set():
                with urllib.request.urlopen(base + "/metrics",
                                            timeout=10) as resp:
                    resp.read()
        except Exception as e:  # noqa: BLE001
            failures.append(f"metrics: {e!r}")

    hammer = threading.Thread(target=metrics_hammer, daemon=True)
    hammer.start()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    stop_metrics.set()
    hammer.join(timeout=30)
    assert not failures, failures
    total = N_CLIENTS * M_REQUESTS
    assert sum(batch_sizes) == total, batch_sizes
    assert len(batch_sizes) < total, (
        f"no coalescing under load: per-call sizes {batch_sizes}")

    text = urllib.request.urlopen(base + "/metrics").read().decode()
    assert f"tpuseg_request_latency_seconds_count {total}" in text
    import re
    err = re.search(r'tpuseg_requests_total\{code="500"\} (\d+)', text)
    assert err is None or err.group(1) == "0", text

    # ---- phase B: SIGTERM drain mid-burst.  Gate the predictor so one
    # accepted request is provably IN FLIGHT on the device and two more
    # are QUEUED behind it when shutdown fires.  The drain contract:
    # every ACCEPTED request is answered (in-flight AND queued) before
    # the socket and batcher close.  server_close() joining the handler
    # threads is what protects the queued ones from batcher.close()
    # erroring them into 500s — _DrainingHTTPServer pins that join
    # across Python versions (on 3.7-3.11 the stock daemon_threads=True
    # class joined nothing).
    in_flight = threading.Event()
    release = threading.Event()

    class Gated:
        max_batch = real_predictor.max_batch

        def __call__(self, batch):
            in_flight.set()
            release.wait(10)
            return real_predictor(batch)

    batcher.predictor = Gated()
    results = {}

    def late_client(i):
        try:
            results[i] = _post(base, payloads[i])
        except Exception as e:  # noqa: BLE001 — recorded and asserted on
            results[i] = e

    first = threading.Thread(target=late_client, args=(0,))
    first.start()
    assert in_flight.wait(10), "no request reached the predictor"
    # these two enqueue BEHIND the gated batch (worker is busy inside it)
    queued = [threading.Thread(target=late_client, args=(i,))
              for i in (1, 2)]
    for t in queued:
        t.start()
    deadline = time.time() + 10  # wait until both sit in the batcher queue
    while batcher._q.qsize() < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert batcher._q.qsize() >= 2, "queued requests never reached the batcher"
    # what the SIGTERM handler does (_serve_until_stopped._stop)
    threading.Thread(target=server.shutdown, daemon=True).start()
    time.sleep(0.2)  # let the drain begin while the batch is gated
    release.set()
    server_thread.join(timeout=30)
    assert not server_thread.is_alive(), "drain did not finish"
    for t in [first] + queued:
        t.join(timeout=30)

    # all three were ACCEPTED before shutdown -> all three must be
    # answered, correctly (no 500s, no cross-wiring, no resets)
    assert set(results) == {0, 1, 2}, results
    for i, r in results.items():
        assert isinstance(r, bytes), f"client {i} dropped by drain: {r!r}"
        assert r == expected[i], f"client {i}: drained response wrong"
    # the drain closed the batcher only after the accepted work finished
    with np.testing.assert_raises(RuntimeError):
        batcher.predict(np.zeros((SIZE, SIZE, 3), np.float32), timeout=5)


def test_listen_backlog_sized_for_production():
    """The TPU-scale soak (benchmarks/serve_soak_tpu.py, 64 clients)
    measured 1295/6400 ConnectionResetErrors from socketserver's default
    backlog of 5; the documented 64-client recipe needs headroom."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        _DrainingHTTPServer)

    assert _DrainingHTTPServer.request_queue_size >= 128
