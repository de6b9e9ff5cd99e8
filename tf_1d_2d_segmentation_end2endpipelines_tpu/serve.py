"""Model export (AOT StableHLO artifacts) + a minimal HTTP inference
server.

The reference has no deployment story: its inference path is Test.py
calling ``model.predict`` one image per call (2DCNN/Test.py:161) from a
live Keras session.  This module is the TPU-native serving path:

- :func:`export_model` — serialize the jitted inference function, with
  the trained weights baked in as constants, to a portable StableHLO
  artifact via ``jax.export``.  The artifact reloads WITHOUT any of the
  model-building code and runs on every platform it was lowered for
  (cpu + tpu by default), so a serving fleet never imports the zoo.
- :func:`load_exported` — deserialize an artifact back to a callable.
- :class:`Predictor` — fixed-shape padded micro-batching around one
  jitted forward: a single compile serves any request size (no
  shape-polymorphic recompiles in the serving hot path).
- :func:`serve` — stdlib ``ThreadingHTTPServer``: POST an image, get a
  PNG mask back.  Zero dependencies beyond PIL (already used by the
  data layer).
"""
from __future__ import annotations

import http.server
import io
import json
import os
import typing as tp

import numpy as np

__all__ = ["export_model", "load_exported", "Predictor", "DynamicBatcher",
           "serve", "serve_1d", "make_server", "make_server_1d"]


# ---------------------------------------------------------------------------
# AOT export
# ---------------------------------------------------------------------------

def _infer_fn(model, params, batch_stats):
    def fn(x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, x, train=False)["out"]
    return fn


def _serving_params(state):
    """Inference weights for a state-like object: the EMA shadow when the
    training run tracked one, else the raw params.  Duck-typed so any
    object with ``.params``/``.batch_stats`` (not only TrainState) can
    drive the serving layer."""
    ema = getattr(state, "ema_params", None)
    return state.params if ema is None else ema


def export_model(model, state, input_shape: tp.Sequence[int],
                 path: str, dtype=None,
                 platforms: tp.Optional[tp.Sequence[str]] = None) -> str:
    """Serialize the inference function (weights baked in) to ``path``.

    ``input_shape`` is the FULL batched input shape, e.g.
    ``(8, 256, 256, 3)`` — the artifact is compiled for exactly that
    shape (static shapes are the TPU serving contract; wrap with
    :class:`Predictor`-style padding for variable request sizes).

    ``platforms`` defaults to ``('cpu', 'tpu')`` so one artifact serves
    both a CPU canary and the TPU fleet; falls back to the current
    platform if multi-platform lowering is unavailable.
    """
    import jax
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.float32
    fn = _infer_fn(model, _serving_params(state), state.batch_stats)
    spec = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    try:
        exported = jax.export.export(
            jax.jit(fn), platforms=tuple(platforms or ("cpu", "tpu")))(spec)
    except Exception:
        # older jax / single-platform lowering only
        exported = jax.export.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str) -> tp.Callable:
    """Deserialize a :func:`export_model` artifact to a callable.

    Needs only jax — none of the framework's model code."""
    import jax

    with open(path, "rb") as f:
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    in_shape = tuple(exported.in_avals[0].shape)

    def call(x):
        x = np.asarray(x)
        if tuple(x.shape) != in_shape:
            raise ValueError(
                f"exported artifact expects input shape {in_shape}, "
                f"got {tuple(x.shape)}")
        return exported.call(x)

    call.input_shape = in_shape  # type: ignore[attr-defined]
    return call


# ---------------------------------------------------------------------------
# Padded micro-batching predictor
# ---------------------------------------------------------------------------

class Predictor:
    """One-compile batched inference: requests of any size are padded to
    a fixed ``max_batch`` and run in chunks, so the serving path never
    triggers an XLA recompile (the TPU analog of a serving runtime's
    static-batch scheduler)."""

    def __init__(self, model, state, input_size: tp.Tuple[int, int, int],
                 max_batch: int = 8, dtype=None,
                 int8_calibration: tp.Optional[np.ndarray] = None,
                 tta: tp.Sequence[str] = ()):
        """``int8_calibration``: a representative input batch — when given,
        every conv runs on the int8 MXU path (quant.py: per-channel weight
        scales folded at compile time, per-tensor activation scales from
        this batch).  TPU v5e's MXU has 2x int8 throughput.

        ``tta``: invertible view transforms (eval.tta names) averaged per
        prediction — one compiled program runs every view."""
        import jax
        import jax.numpy as jnp

        self.max_batch = int(max_batch)
        self.input_size = tuple(input_size)
        self._dtype = dtype or jnp.float32
        if int8_calibration is not None:
            from .quant import calibrate, quantize_predict_fn
            variables = {"params": _serving_params(state)}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            scales = calibrate(model, variables,
                               jnp.asarray(int8_calibration, self._dtype))
            fn = quantize_predict_fn(model, variables, scales)
        else:
            fn = _infer_fn(model, _serving_params(state),
                           state.batch_stats)
        if tta:
            from .eval.tta import make_tta_fn
            fn = make_tta_fn(fn, tuple(tta),
                             rank=len(self.input_size) - 1)
        self._fn = jax.jit(fn)
        # compile once up front on zeros (cached thereafter)
        warm = jnp.zeros((self.max_batch, *self.input_size), self._dtype)
        out = jax.block_until_ready(self._fn(warm))
        self.output_shape = tuple(out.shape[1:])

    def __call__(self, x: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        x = np.asarray(x, np.float32)
        if x.shape[1:] != self.input_size:
            raise ValueError(f"expected inputs of shape "
                             f"(N, {', '.join(map(str, self.input_size))}),"
                             f" got {tuple(x.shape)}")
        n = x.shape[0]
        outs = []
        for start in range(0, n, self.max_batch):
            chunk = x[start:start + self.max_batch]
            pad = self.max_batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *self.input_size), np.float32)])
            out = np.asarray(self._fn(jnp.asarray(chunk, self._dtype)),
                             np.float32)
            outs.append(out[:self.max_batch - pad])
        return np.concatenate(outs) if outs else np.zeros(
            (0, *self.output_shape), np.float32)


class DynamicBatcher:
    """Cross-request dynamic batching: concurrent requests are coalesced
    into one device batch (up to ``Predictor.max_batch``), waiting at most
    ``window_ms`` for co-travellers.  This is the piece that makes a
    static-batch TPU predictor efficient under concurrent load — one MXU
    launch serves many requests instead of max_batch-padded singles."""

    def __init__(self, predictor: Predictor, window_ms: float = 5.0):
        import queue
        import threading

        self.predictor = predictor
        self.window_s = window_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def _loop(self):
        import queue
        import time as _time

        closing = False
        while not (self._stop.is_set() or closing):
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                break
            pending = [] if first[2].get("cancelled") else [first]
            deadline = _time.monotonic() + self.window_s
            while len(pending) < self.predictor.max_batch:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    # close() mid-collection: run what we have, then exit
                    closing = True
                    break
                if not item[2].get("cancelled"):  # timed-out waiter: skip
                    pending.append(item)          # (don't waste the slot)
            if not pending:
                continue
            try:  # np.stack inside: a shape-mismatched request must fail
                # its waiters, never kill the worker thread
                preds = self.predictor(np.stack([x for x, _, _ in pending]))
                for i, (_, ev, box) in enumerate(pending):
                    box["result"] = preds[i]
                    ev.set()
            except Exception as e:  # noqa: BLE001 — fail the waiters, not
                for _, ev, box in pending:  # the worker
                    box["error"] = e
                    ev.set()
        # drain: requests enqueued around close() must not hang their
        # callers for the full predict timeout
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                item[2]["error"] = RuntimeError("DynamicBatcher closed")
                item[1].set()

    def predict(self, x: np.ndarray, timeout: float = 30.0) -> np.ndarray:
        """Submit ONE example (H, W, C); blocks until its batch runs."""
        import threading

        if self._stop.is_set():
            raise RuntimeError("DynamicBatcher closed")
        ev = threading.Event()
        box: tp.Dict[str, tp.Any] = {}
        x = np.asarray(x, np.float32)
        expect = getattr(self.predictor, "input_size", None)
        if expect is not None and tuple(x.shape) != tuple(expect):
            # reject up front so one bad request can't fail co-batched ones
            raise ValueError(f"expected input of shape {tuple(expect)}, "
                             f"got {tuple(x.shape)}")
        self._q.put((x, ev, box))
        if not ev.wait(timeout):
            # flag it so the worker skips this entry instead of burning a
            # device batch slot on an abandoned waiter
            box["cancelled"] = True
            raise TimeoutError("dynamic batcher timed out")
        if "error" in box:
            raise box["error"]
        return box["result"]

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._worker.join(timeout=5)


# ---------------------------------------------------------------------------
# HTTP server
# ---------------------------------------------------------------------------

def _mask_to_png(label: np.ndarray, n_classes: int) -> bytes:
    from PIL import Image

    scale = 255 // max(n_classes - 1, 1)
    buf = io.BytesIO()
    Image.fromarray((label * scale).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def _decode_request(body: bytes, size: tp.Tuple[int, int], color_mode: str,
                    nf: float) -> np.ndarray:
    # same decode/resize/normalize convention as the data layer's
    # load_image (generators.py), from an in-memory stream; the native
    # loader (bit-exact with PIL, tests/test_native_io.py) keeps PIL off
    # the request path
    from .native.imgio import load_image_bytes_native
    arr = load_image_bytes_native(body, size, color_mode, "lanczos", nf)
    if arr is not None:
        return arr
    from PIL import Image
    img = Image.open(io.BytesIO(body))
    img = img.convert("L" if color_mode == "grayscale" else "RGB")
    if img.size != (size[1], size[0]):
        img = img.resize((size[1], size[0]), Image.LANCZOS)
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr / nf


class _ServerMetrics:
    """Thread-safe request counters + a latency ring for /metrics
    (Prometheus text exposition — the reference has no serving story at
    all, SURVEY.md §5; this is the observability surface a production
    deployment scrapes)."""

    def __init__(self, window: int = 1024):
        import collections
        import threading
        self._lock = threading.Lock()
        self.requests = {"200": 0, "400": 0, "404": 0, "413": 0, "500": 0}
        self._lat = collections.deque(maxlen=window)  # quantiles only
        self._lat_count = 0   # cumulative (summary _count must be
        self._lat_sum = 0.0   # monotonic, not the window length)

    def record_code(self, code: int) -> None:
        """Count EVERY response (predict or not) by status code."""
        with self._lock:
            key = str(code)
            self.requests[key] = self.requests.get(key, 0) + 1

    def record_latency(self, latency_s: float) -> None:
        with self._lock:
            self._lat.append(latency_s)
            self._lat_count += 1
            self._lat_sum += latency_s

    def render(self) -> bytes:
        with self._lock:
            lines = ["# TYPE tpuseg_requests_total counter"]
            for code, n in sorted(self.requests.items()):
                lines.append(
                    f'tpuseg_requests_total{{code="{code}"}} {n}')
            lat = sorted(self._lat)
            lines.append("# TYPE tpuseg_request_latency_seconds summary")
            for q in (0.5, 0.9, 0.99):
                # quantiles over the sliding window (recent behavior)...
                v = lat[min(int(q * len(lat)), len(lat) - 1)] if lat \
                    else float("nan")
                lines.append(
                    f'tpuseg_request_latency_seconds{{quantile="{q}"}} '
                    f"{v:.6f}")
            # ...but _sum/_count are CUMULATIVE (rate() needs monotonic)
            lines.append(
                f"tpuseg_request_latency_seconds_sum {self._lat_sum:.6f}")
            lines.append(
                f"tpuseg_request_latency_seconds_count {self._lat_count}")
        return ("\n".join(lines) + "\n").encode()


class _DrainingHTTPServer(http.server.ThreadingHTTPServer):
    """ThreadingHTTPServer whose ``server_close()`` joins in-flight
    handler threads on EVERY supported Python.

    The drain contract (shutdown() stops accepting; server_close()
    blocks until every accepted request is answered; only then is the
    DynamicBatcher closed — _serve_until_stopped) rests on
    ``ThreadingMixIn.server_close()`` joining the handler threads.  On
    Python >= 3.12 block_on_close tracks ALL handler threads, so stock
    ``ThreadingHTTPServer`` already drains; on 3.7-3.11 only NON-daemon
    threads were tracked, and the stock class (daemon_threads=True)
    joined nothing — a SIGTERM drain could tear the batcher down under
    a mid-predict request.  Pinning daemon_threads=False makes the
    contract version-independent and keeps handlers alive through
    interpreter shutdown.  Enforced end-to-end (gated in-flight batch +
    queued requests behind it) by tests/test_serve_soak.py.

    ``request_queue_size`` is the TCP listen backlog;
    ``socketserver.TCPServer`` ships 5, sized for toy traffic.  The
    production-scale soak (benchmarks/serve_soak_tpu.py: 64 clients x
    100 requests against a real UNet++ 256^2 checkpoint on the TPU)
    measured 1295/6400 client ConnectionResetErrors from backlog
    overflow under the 64-connection thundering herd — while every
    ACCEPTED request was answered correctly (zero 500s, zero byte
    mismatches).  128 covers the documented 64-client recipe with
    headroom; kernels cap it at SOMAXCONN."""

    daemon_threads = False
    request_queue_size = 128


def _make_handler(info: tp.Dict[str, tp.Any],
                  decode: tp.Callable[[bytes, tp.Mapping], np.ndarray],
                  predict_one: tp.Callable[[np.ndarray], np.ndarray],
                  respond: tp.Callable[[np.ndarray],
                                       tp.Tuple[bytes, str]]):
    """The HTTP skeleton shared by the 2D and 1D servers: /healthz,
    /info, /metrics, and a POST /predict that maps client decode errors
    to 400 and server-side faults to 500.  ``decode(body, headers) ->
    example``; ``respond(pred) -> (body, content_type)``."""
    import http.server
    import time as _time

    metrics = _ServerMetrics()

    class Handler(http.server.BaseHTTPRequestHandler):
        server_metrics = metrics  # exposed for the owning server/tests

        def log_message(self, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            # count at send time: every response (incl. 404s) appears in
            # /metrics exactly ONCE, even if the client hung up and the
            # socket write below fails
            metrics.record_code(code)
            try:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except OSError:
                pass  # client gone; the response is already counted

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/info":
                self._send(200, json.dumps(info).encode(),
                           "application/json")
            elif self.path == "/metrics":
                self._send(200, metrics.render(),
                           "text/plain; version=0.0.4")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if not self.path.startswith("/predict"):
                self._send(404, b"not found", "text/plain")
                return
            t0 = _time.perf_counter()
            try:  # client errors (undecodable payload) -> 400
                length = int(self.headers.get("Content-Length", "0"))
                if length > 256 * 1024 * 1024:  # bound host memory per
                    # request; megapixel PNGs are far below this
                    self._send(413, b"error: request too large",
                               "text/plain")
                    return
                body = self.rfile.read(length)
                x = decode(body, self.headers)
            except Exception as e:  # noqa: BLE001 — serving must not die
                self._send(400, f"error: {e}".encode(), "text/plain")
                return
            try:  # server-side faults (predict/encode) -> 500
                out_body, ctype = respond(predict_one(x))
            except Exception as e:  # noqa: BLE001
                self._send(500, f"error: {e}".encode(), "text/plain")
                return
            metrics.record_latency(_time.perf_counter() - t0)
            self._send(200, out_body, ctype)

    return Handler


def _load_calibration_images(calib_dir: tp.Optional[str], train_cfg,
                             size, n: int) -> np.ndarray:
    """Up to ``n`` decoded images for int8 calibration — from
    ``calib_dir`` if it has any, else the config's train_dir tree, else a
    uniform[0,1] batch (degraded calibration, warned)."""
    from .data.generators import _list_images, load_image

    paths: tp.List[str] = []
    for root in (calib_dir, train_cfg.train_dir):
        if not (root and os.path.isdir(root)):
            continue
        # same layout resolution as SegmentationFolderDataset: an
        # images/ (or img/) subdir at any depth holds the IMAGES (never
        # masks/msk); a dir with no such subdirs is itself flat images
        image_dirs = []
        for dirpath, dirs, _ in sorted(os.walk(root)):
            for sub in sorted(dirs):
                if sub in ("images", "img"):
                    image_dirs.append(os.path.join(dirpath, sub))
        for d in image_dirs or [root]:
            paths.extend(_list_images(d)[:n - len(paths)])
            if len(paths) >= n:
                break
        if paths:
            break
    if not paths:
        print("WARNING: no calibration images found; int8 scales "
              "calibrated on random inputs (pass --calib-dir for "
              "representative data)", flush=True)
        return np.random.default_rng(0).uniform(
            size=(n, *size, train_cfg.num_channels)).astype(np.float32)
    return np.stack([
        load_image(p, size, train_cfg.image_color_mode, "lanczos")
        / train_cfg.normalizing_factor_img for p in paths])


def make_server(train_cfg, ckpt_dir: str, host: str = "127.0.0.1",
                port: int = 8000, max_batch: int = 1, threshold: float = 0.5,
                dtype=None, int8: bool = False,
                calib_dir: tp.Optional[str] = None):
    """Build (but do not start) the HTTP server.  Returns the
    ``http.server.ThreadingHTTPServer`` — call ``serve_forever()`` on it
    (or ``handle_request()`` in tests).

    Routes:
      - ``GET  /healthz``  -> 200 ``ok``
      - ``GET  /info``     -> model/config JSON
      - ``POST /predict``  -> request body = encoded image (PNG/JPEG/...),
        response = PNG label mask (binary: thresholded; multiclass: the
        reference's sum-of-binarized ordinal rule, Test.py:169-175)
    """
    import http.server

    from .drivers import _resolve_dtype, _restore_trainer
    from .eval import label_from_pred

    dtype = _resolve_dtype(train_cfg, dtype)
    model, trainer = _restore_trainer(train_cfg, ckpt_dir, "serving",
                                      dtype=dtype)
    size = (train_cfg.imlength, train_cfg.imwidth)
    calib = (_load_calibration_images(calib_dir, train_cfg, size,
                                      max(max_batch, 8))
             if int8 else None)
    predictor = Predictor(model, trainer.state,
                          (*size, train_cfg.num_channels),
                          max_batch=max_batch, dtype=dtype,
                          int8_calibration=calib)
    # max_batch > 1: coalesce concurrent requests into one device batch
    batcher = DynamicBatcher(predictor) if max_batch > 1 else None
    n_fg = max(train_cfg.class_number, 1)
    info = {
        "model": f"{train_cfg.encoder_name}_{train_cfg.decoder_name}",
        "input_size": [*size, train_cfg.num_channels],
        "class_number": train_cfg.class_number,
        "threshold": threshold,
        "max_batch": max_batch,
        "int8": bool(int8),
    }

    def _respond(pred):
        label = label_from_pred(pred, train_cfg.class_number, threshold)
        return _mask_to_png(label, n_fg + 1), "image/png"

    Handler = _make_handler(
        info,
        decode=lambda body, headers: _decode_request(
            body, size, train_cfg.image_color_mode,
            train_cfg.normalizing_factor_img),
        predict_one=(batcher.predict if batcher is not None
                     else lambda x: predictor(x[None])[0]),
        respond=_respond)
    server = _DrainingHTTPServer((host, port), Handler)
    server.batcher = batcher  # close() on teardown if you own the server
    return server


def _decode_signal_request(body: bytes, ctype: str, length: int,
                           channels: int) -> np.ndarray:
    """Decode one 1D inference request.

    - ``application/json``: ``{"signal": [...]}`` or a bare list —
      shape (L,) or (L, C)
    - anything else: raw little-endian float32 of exactly L*C values
    """
    if "json" in (ctype or ""):
        obj = json.loads(body)
        if isinstance(obj, dict):
            obj = obj.get("signal")
        arr = np.asarray(obj, np.float32)
    else:
        arr = np.frombuffer(body, "<f4").astype(np.float32)
    if arr.ndim == 1:
        if arr.size != length * channels:
            raise ValueError(f"expected {length * channels} float32 "
                             f"values, got {arr.size}")
        arr = arr.reshape(length, channels)
    if arr.shape != (length, channels):
        raise ValueError(f"expected signal of shape ({length}, "
                         f"{channels}), got {tuple(arr.shape)}")
    return arr


def make_server_1d(cfg, host: str = "127.0.0.1", port: int = 8000,
                   max_batch: int = 1, dtype=None):
    """HTTP server for 1D signal models (the 1D analog of
    :func:`make_server`; the reference's 1D flow has no serving story at
    all).  Routes:

      - ``GET  /healthz``  -> 200 ``ok``
      - ``GET  /info``     -> model/config JSON
      - ``POST /predict``  -> body = JSON ``{"signal": [...]}``
        (or raw float32), response = JSON ``{"output": [[...], ...]}``
        — the regression output (Classification: softmax probs)
    """
    import http.server

    from .drivers import _resolve_dtype
    from .drivers_1d import _restore_trainer_1d

    dtype = _resolve_dtype(cfg, dtype)
    model, trainer, _ = _restore_trainer_1d(cfg, "serving", dtype=dtype)
    predictor = Predictor(model, trainer.state,
                          (cfg.signal_length, cfg.num_channel),
                          max_batch=max_batch, dtype=dtype)
    batcher = DynamicBatcher(predictor) if max_batch > 1 else None
    info = {
        "model": cfg.model_name,
        "input_size": [cfg.signal_length, cfg.num_channel],
        "problem_type": cfg.problem_type,
        "output_nums": cfg.output_nums,
        "max_batch": max_batch,
    }

    Handler = _make_handler(
        info,
        decode=lambda body, headers: _decode_signal_request(
            body, headers.get("Content-Type", ""),
            cfg.signal_length, cfg.num_channel),
        predict_one=(batcher.predict if batcher is not None
                     else lambda x: predictor(x[None])[0]),
        respond=lambda pred: (json.dumps(
            {"output": np.asarray(pred, np.float64).tolist()}).encode(),
            "application/json"))
    server = _DrainingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server


def _serve_until_stopped(server) -> None:
    """serve_forever with graceful teardown: SIGTERM (scheduler kill /
    pod preemption) and Ctrl-C both drain in-flight requests, stop the
    dynamic batcher's worker, and close the socket instead of dying
    mid-response."""
    import signal
    import threading

    def _stop(*_):
        # shutdown() must not run on the serve_forever thread
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        prev = signal.signal(signal.SIGTERM, _stop)
    except ValueError:  # not the main thread (embedded/test use)
        prev = None
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)
        # order matters: server_close() JOINS in-flight handler threads
        # (_DrainingHTTPServer: non-daemon handlers, which ThreadingMixIn
        # tracks and joins — stock ThreadingHTTPServer joins NOTHING) so
        # batched requests already in predict finish BEFORE the batcher
        # worker is torn down
        server.server_close()
        if getattr(server, "batcher", None) is not None:
            server.batcher.close()
        print("tpuseg server stopped", flush=True)


def serve_1d(config_path: str = "Signal_Configs.ini",
             host: str = "127.0.0.1", port: int = 8000,
             max_batch: int = 1) -> None:
    """CLI entry: load the persisted signal config + checkpoint and serve
    forever."""
    from .utils.config import load_signal_config

    cfg = load_signal_config(config_path)
    server = make_server_1d(cfg, host=host, port=port, max_batch=max_batch)
    print(f"tpuseg serving 1D {cfg.model_name} on "
          f"http://{host}:{server.server_address[1]}  (POST /predict)",
          flush=True)
    _serve_until_stopped(server)


def serve(config_path: str = "Train_Configs.ini", host: str = "127.0.0.1",
          port: int = 8000, fold: int = 1, max_batch: int = 1,
          threshold: float = 0.5, int8: bool = False,
          calib_dir: tp.Optional[str] = None) -> None:
    """CLI entry: load the persisted train config + fold checkpoint and
    serve forever."""
    from .utils.config import load_train_config

    cfg = load_train_config(config_path)
    ckpt_dir = os.path.join(cfg.save_dir or "", f"Fold_{fold}")
    server = make_server(cfg, ckpt_dir, host=host, port=port,
                         max_batch=max_batch, threshold=threshold,
                         int8=int8, calib_dir=calib_dir)
    print(f"tpuseg serving {cfg.encoder_name}_{cfg.decoder_name} on "
          f"http://{host}:{server.server_address[1]}  (POST /predict)",
          flush=True)
    _serve_until_stopped(server)
