"""Production-scale serving soak against a REAL checkpoint on the TPU.

Executes the docs/SCALING.md "serving soak (manual recipe)" end to end:
train a flagship UNet++ 256^2 fold through the INI driver (synthetic
images — the training and checkpoint are real, the pixels are not),
launch ``tpuseg serve`` as a subprocess on the TPU, hammer it with
N_CLIENTS x M_REQUESTS concurrent byte-checked requests, snapshot
/metrics under load, then SIGTERM and time the graceful drain.

The reference has no serving layer at all (SURVEY.md §5;
/root/reference/TensorFlow/2DCNN/Test.py:161 predicts one image at a
time in-process) — this soak pins the framework's production contract:
zero non-200s, zero cross-wired responses, drain answers everything.

Run on the TPU tunnel (the server subprocess owns the chip; this client
process never imports jax):

    python benchmarks/serve_soak_tpu.py [clients] [requests_per_client] [drain-mid]

``drain-mid`` sends SIGTERM while the burst is still in flight: the
drain contract says every ACCEPTED request is answered before the
batcher closes — clients see clean responses for in-flight work and
connection refusals (never 500s, never truncated bytes) for connects
after the socket closes.

Prints one JSON line; record it in docs/SCALING.md.
"""
import http.client
import io
import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/tpuseg_soak"
SIZE = 256
PORT = 8765


def _write_dataset(root, n):
    from PIL import Image
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0, 255, (SIZE, SIZE, 3))).astype(np.uint8)
        msk = np.zeros((SIZE, SIZE), np.uint8)
        msk[40:180, 60:200] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"{i}.png"))
        Image.fromarray(msk).save(os.path.join(root, "masks", f"{i}.png"))


def _ensure_checkpoint() -> str:
    """Train one real UNet++ 256^2 fold (subprocess owns the TPU)."""
    ini = os.path.join(WORK, "Train_Configs.ini")
    best = os.path.join(WORK, "Results", "Fold_1", "best")
    if os.path.isdir(best):
        return ini
    _write_dataset(os.path.join(WORK, "Data", "Train"), 16)
    _write_dataset(os.path.join(WORK, "Data", "Val"), 4)
    sys.path.insert(0, REPO)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, save_train_config)
    cfg = TrainConfig(
        train_dir=os.path.join(WORK, "Data", "Train"),
        val_dir=os.path.join(WORK, "Data", "Val"),
        imlength=SIZE, imwidth=SIZE, model_width=32, model_depth=4,
        decoder_name="UNetPP", model_genre="UNet", batch_size=4,
        num_epochs=1, learning_rate=1e-3, loss_function="BCEDiceLoss",
        metric_list=("BinaryAccuracy",), monitor_param="val_loss",
        save_dir=os.path.join(WORK, "Results"), start_fold=1, end_fold=1,
        save_history=True, load_weights=False)
    save_train_config(cfg, ini)
    print("training the soak checkpoint (real TPU)...", flush=True)
    subprocess.run(
        [sys.executable, "-m",
         "tf_1d_2d_segmentation_end2endpipelines_tpu", "train", ini],
        cwd=REPO, check=True, timeout=3600)
    return ini


def _png_payloads(n=8):
    from PIL import Image
    rng = np.random.default_rng(11)
    out = []
    for _ in range(n):
        img = Image.fromarray(
            (rng.uniform(size=(SIZE, SIZE, 3)) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        out.append(buf.getvalue())
    return out


def _post(body: bytes, timeout=180):
    c = http.client.HTTPConnection("127.0.0.1", PORT, timeout=timeout)
    try:
        c.request("POST", "/predict", body=body)
        r = c.getresponse()
        return r.status, r.read()
    finally:
        c.close()


def _metrics() -> str:
    c = http.client.HTTPConnection("127.0.0.1", PORT, timeout=30)
    try:
        c.request("GET", "/metrics")
        return c.getresponse().read().decode()
    finally:
        c.close()


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    drain_mid = len(sys.argv) > 3 and sys.argv[3] == "drain-mid"
    ini = _ensure_checkpoint()

    srv = subprocess.Popen(
        [sys.executable, "-m", "tf_1d_2d_segmentation_end2endpipelines_tpu",
         "serve", ini, "--port", str(PORT), "--max-batch", "32"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)
    try:
        # wait for the server (compile via the tunnel takes minutes)
        payloads = _png_payloads()
        deadline = time.time() + 1800
        expected = None
        while time.time() < deadline:
            try:
                st, _ = _post(payloads[0], timeout=600)
                if st == 200:
                    break
            except OSError:
                time.sleep(5)
        else:
            raise SystemExit("server never came up")
        expected = []
        for body in payloads:     # ground truth for cross-wiring checks
            st, resp = _post(body, timeout=600)
            assert st == 200
            expected.append(resp)

        fails, mismatches = [], []
        lat = []
        post_sig = {"answered": 0, "refused": 0}
        sig_sent = threading.Event()
        lock = threading.Lock()

        def client(ci):
            for j in range(per):
                k = (ci * per + j) % len(payloads)
                t0 = time.perf_counter()
                sent_before_sig = not sig_sent.is_set()
                try:
                    st, resp = _post(payloads[k])
                except Exception as e:  # noqa: BLE001 — recorded, not fatal
                    with lock:
                        if sig_sent.is_set():
                            # connects after the socket closed are the
                            # EXPECTED drain behavior, never an error
                            post_sig["refused"] += 1
                        else:
                            fails.append(f"{ci}/{j}: {type(e).__name__}")
                    if sig_sent.is_set():
                        return          # server is draining; client done
                    continue
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)
                    if st != 200:
                        fails.append(f"{ci}/{j}: HTTP {st}")
                    elif resp != expected[k]:
                        mismatches.append(f"{ci}/{j}")
                    elif sig_sent.is_set() and sent_before_sig:
                        post_sig["answered"] += 1   # in-flight, drained OK

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        time.sleep(10)
        mid_metrics = _metrics()          # /metrics under load
        drain_s = rc = None
        if drain_mid:
            # SIGTERM while the burst is in full flight
            td = time.perf_counter()
            sig_sent.set()
            srv.send_signal(signal.SIGTERM)
            rc = srv.wait(timeout=120)
            drain_s = time.perf_counter() - td
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        qs = codes = {}
        if not drain_mid:
            end_metrics = _metrics()
            qs = dict(re.findall(
                r'tpuseg_request_latency_seconds\{quantile="([\d.]+)"\} '
                r'([\d.eE+-]+)', end_metrics))
            codes = dict(re.findall(
                r'tpuseg_requests_total\{code="(\d+)"\} (\d+)', end_metrics))
            # graceful drain: SIGTERM, in-flight answered, clean exit
            td = time.perf_counter()
            sig_sent.set()
            srv.send_signal(signal.SIGTERM)
            rc = srv.wait(timeout=120)
            drain_s = time.perf_counter() - td

        lat.sort()
        result = {
            "mode": "drain-mid" if drain_mid else "full-soak",
            "clients": clients, "requests_per_client": per,
            "total_requests": clients * per,
            "answered_200": len(lat),
            "failures": len(fails), "byte_mismatches": len(mismatches),
            "wall_s": round(wall, 1),
            "req_per_s": round(len(lat) / wall, 1),
            "client_p50_ms": round(lat[len(lat) // 2] * 1e3, 1) if lat else None,
            "client_p99_ms": round(lat[int(len(lat) * 0.99)] * 1e3, 1) if lat else None,
            "server_quantiles_s": qs, "server_codes": codes,
            "metrics_alive_under_load": "tpuseg_requests_total" in mid_metrics,
            "in_flight_answered_after_sigterm": post_sig["answered"],
            "refused_after_sigterm": post_sig["refused"],
            "drain_s": round(drain_s, 2), "server_exit": rc,
        }
        print(json.dumps(result), flush=True)
        if fails[:5] or mismatches[:5]:
            print("sample failures:", fails[:5], mismatches[:5])
    finally:
        if srv.poll() is None:
            srv.kill()


if __name__ == "__main__":
    main()
