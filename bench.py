"""Benchmark: UNet++ 256² bf16 train-step throughput (images/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
computed against the first recorded run of this benchmark on this hardware
(stored in BENCH_BASELINE.json at round 1) -- it tracks relative progress
across rounds; >1.0 means faster than the round-1 framework.
"""
import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: first compile through the remote-compile
    # tunnel costs minutes; subsequent bench runs reuse the executable
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_tpu_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        make_mesh, replicated, shard_batch)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer, make_train_step)

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 32 if on_tpu else 4
    size = 256 if on_tpu else 64
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = SegModel(decoder_name="UNetPP", model_width=32, model_depth=4,
                     output_nums=1, final_activation="sigmoid", dtype=dtype)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch, size, size, 1)) > 0.5).astype(np.float32)

    mesh = make_mesh()
    optimizer = make_optimizer("Adam", 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, optimizer,
                                   get_loss("BCEDiceLoss")),
                   donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})

    # warmup / compile.  NOTE: under the axon TPU tunnel,
    # block_until_ready() does not actually wait for remote execution, so
    # all timing fences are host fetches of a dependent scalar.
    for _ in range(3):
        state, loss, _ = step(state, b["x"], b["y"], ())
    float(loss)

    iters = 50 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, b["x"], b["y"], ())
    assert np.isfinite(float(loss))  # host fetch = execution fence
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    ips = batch * iters / dt / n_chips

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    key = f"unetpp_{size}_bf16_train_ips_per_chip_{'tpu' if on_tpu else 'cpu'}"
    baseline = {}
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f)
    if key not in baseline:
        baseline[key] = ips
        with open(base_path, "w") as f:
            json.dump(baseline, f, indent=1)
    vs = ips / baseline[key]

    print(json.dumps({
        "metric": f"UNet++ {size}x{size} bf16 train throughput",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
