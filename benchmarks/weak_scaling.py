"""dp weak-scaling probe on the virtual CPU mesh (r2 verdict item 8).

Records per-device step time at mesh sizes 1/2/4/8 with a FIXED
per-device batch (weak scaling: ideal = flat step time), plus the loss
at a FIXED global batch across mesh sizes (must be identical — catches
sharding regressions the single-step dryrun can't).  CPU-backend
numbers are correctness-grade, not perf-grade: they document collective
overhead growth, not TPU throughput.

Run:  python benchmarks/weak_scaling.py
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"  # correctness probe: never the TPU
# (the session env pins JAX_PLATFORMS=axon — a single-chip tunnel)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop the backend the sitecustomize already initialized (axon)
    import jax.extend.backend
    jax.extend.backend.clear_backends()
except Exception:
    pass

# share the test suite's persistent compile cache (8 train-step compiles
# on the 1-core CI host are ~6 min cold, seconds warm)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.hostkey import (  # noqa: E402,E501
    machine_key)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", f".jax_cache-{machine_key()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel  # noqa: E402
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (  # noqa: E402
    make_mesh, shard_batch, state_shardings)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (  # noqa: E402
    create_train_state, get_loss, make_optimizer, make_train_step)


def run(sizes=(1, 2, 4, 8), per_device_batch=2, steps=5):
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=2)
    opt = make_optimizer("Adam", 1e-3)
    rng = np.random.default_rng(0)
    results = []
    fixed_losses = []
    global_x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    global_y = (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32)
    for n in sizes:
        mesh = make_mesh(jax.devices()[:n], data=n)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.asarray(global_x[:1]), opt)
        state = jax.device_put(state, state_shardings(mesh, state))
        step = jax.jit(make_train_step(model, opt, get_loss("BCEDiceLoss")))

        # (a) fixed GLOBAL batch: loss must be identical across mesh sizes
        bg = shard_batch(mesh, {"x": global_x, "y": global_y})
        _, loss, _ = step(state, bg["x"], bg["y"], ())
        fixed_losses.append(float(loss))

        # (b) weak scaling: per-device batch fixed, global batch = n * pdb
        xs = rng.normal(size=(n * per_device_batch, 32, 32, 3)).astype(
            np.float32)
        ys = (rng.uniform(size=(n * per_device_batch, 32, 32, 1)) > 0.5
              ).astype(np.float32)
        b = shard_batch(mesh, {"x": xs, "y": ys})
        st, loss, _ = step(state, b["x"], b["y"], ())  # compile + warm
        float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            st, loss, _ = step(st, b["x"], b["y"], ())
        elapsed = (time.perf_counter() - t0) / steps
        _ = float(loss)  # fence
        results.append({"devices": n, "global_batch": n * per_device_batch,
                        "step_ms": round(elapsed * 1e3, 2),
                        "fixed_batch_loss": fixed_losses[-1]})
    return results, fixed_losses


if __name__ == "__main__":
    import json
    results, losses = run()
    spread = max(losses) - min(losses)
    for r in results:
        print(json.dumps(r))
    print(json.dumps({"fixed_global_batch_loss_spread": spread,
                      "ok": bool(spread < 1e-6)}))
