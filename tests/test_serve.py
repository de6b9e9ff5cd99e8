"""Serving layer: AOT export round-trip, padded-batch predictor, HTTP
server (new TPU-native deployment path; the reference has none —
SURVEY.md §5 'distributed communication backend: None', Test.py:161
predicts one image at a time from a live session)."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
    Predictor, export_model, load_exported, make_server)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    TrainConfig)


def _tiny_trainer(size=32, width=4, depth=2):
    model = SegModel(decoder_name="UNet", model_width=width,
                     model_depth=depth, output_nums=1,
                     final_activation="sigmoid")
    trainer = Trainer(model)
    trainer.init_state(np.zeros((1, size, size, 3), np.float32))
    return model, trainer


def test_export_roundtrip(tmp_path):
    """Serialized StableHLO artifact reproduces the live forward exactly
    and enforces its static input shape."""
    model, trainer = _tiny_trainer()
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    path = export_model(model, trainer.state, (2, 32, 32, 3),
                        str(tmp_path / "m.stablehlo"))
    call = load_exported(path)
    got = np.asarray(call(x))
    want = np.asarray(trainer.predict(x)["out"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    with pytest.raises(ValueError, match="expects input shape"):
        call(x[:1])


def test_predictor_padding_matches_direct():
    """Requests not divisible by max_batch are padded/chunked without
    changing the results (and without recompiling)."""
    model, trainer = _tiny_trainer()
    pred = Predictor(model, trainer.state, (32, 32, 3), max_batch=4)
    x = np.random.default_rng(1).normal(size=(7, 32, 32, 3)).astype(
        np.float32)
    got = pred(x)
    want = np.asarray(trainer.predict(x)["out"])
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_http_server_predict(tmp_path):
    """POST an encoded image -> PNG label mask of the model size; /info
    and /healthz respond."""
    from PIL import Image

    cfg = TrainConfig(imlength=32, imwidth=32, num_channels=3,
                      decoder_name="UNet", model_width=4, model_depth=2,
                      output_nums=1, class_number=1,
                      save_dir=str(tmp_path))
    # max_batch=2 routes requests through the DynamicBatcher path
    server = make_server(cfg, str(tmp_path / "Fold_1"), port=0, max_batch=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
        info = json.loads(urllib.request.urlopen(base + "/info").read())
        assert info["input_size"] == [32, 32, 3]

        img = Image.fromarray(
            (np.random.default_rng(2).uniform(size=(48, 48, 3)) * 255
             ).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        req = urllib.request.Request(base + "/predict", data=buf.getvalue(),
                                     method="POST")
        resp = urllib.request.urlopen(req)
        assert resp.headers["Content-Type"] == "image/png"
        mask = Image.open(io.BytesIO(resp.read()))
        assert mask.size == (32, 32)

        bad = urllib.request.Request(base + "/predict", data=b"not an image",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400

        # oversized Content-Length is refused up-front (413), bounding
        # host memory per request
        huge = urllib.request.Request(
            base + "/predict", data=b"x",
            headers={"Content-Length": str(512 * 1024 * 1024)},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(huge)
        assert exc.value.code == 413

        # /metrics: Prometheus text counting EVERY response by code
        # (healthz + info + predict above = three 200s) with a
        # cumulative latency summary for successful predicts only
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(base + "/nope")
        assert exc.value.code == 404
        text = urllib.request.urlopen(base + "/metrics").read().decode()
        assert 'tpuseg_requests_total{code="200"} 3' in text
        assert 'tpuseg_requests_total{code="400"} 1' in text
        assert 'tpuseg_requests_total{code="404"} 1' in text
        assert 'tpuseg_requests_total{code="413"} 1' in text
        assert "tpuseg_request_latency_seconds_count 1" in text
        assert "tpuseg_request_latency_seconds_sum " in text
        assert 'quantile="0.5"' in text
    finally:
        server.shutdown()
        server.server_close()


def test_calibration_images_skip_masks(tmp_path):
    """_load_calibration_images must resolve the dataset layouts
    (images/masks and img/msk at any depth) and calibrate on IMAGES."""
    from PIL import Image

    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        _load_calibration_images)

    root = tmp_path / "train" / "fold_1"
    (root / "img").mkdir(parents=True)
    (root / "msk").mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        Image.fromarray((rng.uniform(size=(16, 16, 3)) * 255).astype(
            np.uint8)).save(root / "img" / f"a_{i}.png")
        # masks are all-255: easily detected if wrongly calibrated on
        Image.fromarray(np.full((16, 16), 255, np.uint8)).save(
            root / "msk" / f"a_{i}.png")
    cfg = TrainConfig(imlength=16, imwidth=16, num_channels=3,
                      train_dir=str(tmp_path / "train"))
    batch = _load_calibration_images(None, cfg, (16, 16), 4)
    assert batch.shape[0] == 2  # the two images, no masks
    assert batch.max() < 1.0  # mask PNGs would be exactly 1.0


def test_http_server_int8(tmp_path):
    """make_server(int8=True) calibrates (falling back to random inputs
    with a warning when no images exist) and serves quantized masks."""
    from PIL import Image

    cfg = TrainConfig(imlength=32, imwidth=32, num_channels=3,
                      decoder_name="UNet", model_width=4, model_depth=2,
                      output_nums=1, class_number=1,
                      save_dir=str(tmp_path))
    # calib images present: exercises the real calibration-loading path
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        Image.fromarray((rng.uniform(size=(32, 32, 3)) * 255).astype(
            np.uint8)).save(calib_dir / f"img_{i}.png")
    server = make_server(cfg, str(tmp_path / "Fold_1"), port=0,
                         int8=True, calib_dir=str(calib_dir))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        info = json.loads(urllib.request.urlopen(base + "/info").read())
        assert info["int8"] is True
        img = Image.fromarray(
            (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        resp = urllib.request.urlopen(urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST"))
        mask = Image.open(io.BytesIO(resp.read()))
        assert mask.size == (32, 32)
    finally:
        server.shutdown()
        server.server_close()


def test_dynamic_batcher_coalesces_concurrent_requests():
    """N concurrent single-image requests ride ONE device batch (not N
    padded singles), and every caller gets its own correct result."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        DynamicBatcher)

    model, trainer = _tiny_trainer()
    predictor = Predictor(model, trainer.state, (32, 32, 3), max_batch=4)
    calls = []

    class Counting:
        max_batch = predictor.max_batch

        def __call__(self, batch):
            calls.append(batch.shape[0])
            return predictor(batch)

    batcher = DynamicBatcher(Counting(), window_ms=100.0)
    try:
        x = np.random.default_rng(3).normal(size=(4, 32, 32, 3)).astype(
            np.float32)
        results = [None] * 4

        def worker(i):
            results[i] = batcher.predict(x[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        want = np.asarray(trainer.predict(x)["out"])
        for i in range(4):
            np.testing.assert_allclose(results[i], want[i], atol=1e-5)
        assert sum(calls) == 4 and len(calls) < 4, (
            f"expected coalesced batches, got per-call sizes {calls}")
    finally:
        batcher.close()


def test_dynamic_batcher_propagates_errors():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        DynamicBatcher)

    class Boom:
        max_batch = 2

        def __call__(self, batch):
            raise RuntimeError("kaboom")

    batcher = DynamicBatcher(Boom(), window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="kaboom"):
            batcher.predict(np.zeros((32, 32, 3), np.float32), timeout=10)
    finally:
        batcher.close()


def test_dynamic_batcher_close_and_timeout_semantics():
    """ADVICE r2: predict() after close() fails fast (not a 30 s hang),
    requests racing close() are drained with an error, and a timed-out
    waiter's entry is skipped by the worker instead of burning a slot."""
    import time
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        DynamicBatcher)

    served = []

    class Slow:
        max_batch = 2

        def __call__(self, batch):
            served.append(batch.shape[0])
            return batch

    batcher = DynamicBatcher(Slow(), window_ms=1.0)
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.predict(np.zeros((4, 4, 1), np.float32))

    # timed-out entry: flag set, worker skips it (no device call for it)
    batcher2 = DynamicBatcher(Slow(), window_ms=1.0)
    try:
        stall = threading.Event()

        class Stalled:
            max_batch = 2

            def __call__(self, batch):
                stall.wait(5)
                served.append(batch.shape[0])
                return batch

        batcher2.predictor = Stalled()
        # first request occupies the worker inside the stalled predictor
        t1 = threading.Thread(target=lambda: batcher2.predict(
            np.zeros((4, 4, 1), np.float32), timeout=10))
        t1.start()
        time.sleep(0.2)
        # second request times out while queued behind the stall
        with pytest.raises(TimeoutError):
            batcher2.predict(np.ones((4, 4, 1), np.float32), timeout=0.1)
        stall.set()
        t1.join(timeout=10)
        time.sleep(0.3)  # give the worker a chance to (wrongly) serve it
        assert served == [1], served  # the cancelled entry never ran
    finally:
        stall.set()
        batcher2.close()


def test_http_server_1d_predict(tmp_path):
    """1D serving: JSON and raw-float32 signals in, JSON predictions out;
    bad payloads get 400."""
    import urllib.error

    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        make_server_1d)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        Signal1DConfig)

    cfg = Signal1DConfig(signal_length=32, num_channel=1,
                         model_name="UNet", model_depth=2, model_width=4,
                         d_s=0, save_dir=str(tmp_path / "none"))
    server = make_server_1d(cfg, port=0, max_batch=2)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        assert urllib.request.urlopen(base + "/healthz").read() == b"ok"
        info = json.loads(urllib.request.urlopen(base + "/info").read())
        assert info["input_size"] == [32, 1]

        sig = np.random.default_rng(5).normal(size=(32,)).astype(
            np.float32)
        req = urllib.request.Request(
            base + "/predict", data=json.dumps(
                {"signal": sig.tolist()}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        out_json = np.asarray(
            json.loads(urllib.request.urlopen(req).read())["output"],
            np.float32)
        assert out_json.shape == (32, 1)

        # raw float32 body must give the same answer
        req = urllib.request.Request(
            base + "/predict", data=sig.tobytes(),
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        out_raw = np.asarray(
            json.loads(urllib.request.urlopen(req).read())["output"],
            np.float32)
        np.testing.assert_allclose(out_raw, out_json, atol=1e-6)

        bad = urllib.request.Request(base + "/predict",
                                     data=b"\x00\x01\x02",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        if server.batcher is not None:
            server.batcher.close()
