"""Serving-path benchmark: batched inference throughput on the device.

Measures the ``serve.Predictor`` path (padded static-batch jitted
forward, bf16) for the flagship UNet++ 256² at several max_batch sizes —
the numbers behind the serving section of docs/SCALING.md.  Each timing
fences with a host fetch (tunnel semantics; the per-call tunnel
round-trip is measured and reported separately so the device-side
throughput is visible).

Usage: python benchmarks/serving_bench.py [max_batch ...]   (default 1 8 32)
Prints one JSON line per batch size; each line carries both the float
path and the int8-quantized path (quant.py) so the quantization speedup
is measured side by side.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import Predictor
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 256 if on_tpu else 64
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = SegModel(decoder_name="UNetPP", model_width=32, model_depth=4,
                     output_nums=1, final_activation="sigmoid",
                     dtype=dtype)
    trainer = Trainer(model)
    trainer.init_state(np.zeros((1, size, size, 3), np.float32))

    sizes = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    for mb in sizes:
        pred = Predictor(model, trainer.state, (size, size, 3),
                         max_batch=mb, dtype=dtype)
        x = np.random.default_rng(0).normal(
            size=(mb, size, size, 3)).astype(np.float32)
        pred(x)  # warm (compiled in Predictor.__init__ already)
        iters = 20 if on_tpu else 3
        t0 = time.perf_counter()
        for _ in range(iters):
            pred(x)  # __call__ fetches the full mask to numpy = fence
        dt = time.perf_counter() - t0

        # device-side compute throughput via the shared fencing helper
        # (utils/bench_timing.py) — excludes the host<->device (here:
        # tunnel) transfer of the mask bytes, which dominates the request
        # path on a remote tunnel but not on a co-located production host
        from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.bench_timing \
            import chained_device_time
        xb = jnp.asarray(x, dtype)
        dev_dt = chained_device_time(pred._fn, xb, K=10 if on_tpu else 2,
                                     reps=5 if on_tpu else 2)

        # int8-quantized path: same model, convs on the int8 MXU
        pred_q = Predictor(model, trainer.state, (size, size, 3),
                           max_batch=mb, dtype=dtype,
                           int8_calibration=x[:min(mb, 8)])
        q_dt = chained_device_time(pred_q._fn, xb, K=10 if on_tpu else 2,
                                   reps=5 if on_tpu else 2)

        print(json.dumps({
            "max_batch": mb,
            "request_path_ips": round(mb * iters / dt, 2),
            "request_ms": round(dt / iters * 1e3, 2),
            "device_ips": round(mb / dev_dt, 2),
            "device_ms_per_batch": round(dev_dt * 1e3, 2),
            "int8_device_ips": round(mb / q_dt, 2),
            "int8_ms_per_batch": round(q_dt * 1e3, 2),
            "int8_speedup": round(dev_dt / q_dt, 3),
            "note": "request path includes the full mask fetch over the "
                    "axon tunnel; device_ips is the co-located ceiling",
        }), flush=True)


if __name__ == "__main__":
    main()
