"""Measure train-step throughput for the five BASELINE.md configs on the
current device.  Writes benchmarks/RESULTS.json and prints a table.

Timing is fenced by host fetches (the axon tunnel's block_until_ready does
not wait for remote execution).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(model, x, y, loss="BCEDiceLoss", iters=20,
            loss_weights=None, lr=1e-3) -> float:
    import jax
    import jax.numpy as jnp

    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        make_mesh, replicated, shard_batch)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer, make_train_step)

    mesh = make_mesh()
    opt = make_optimizer("Adam", lr)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), opt)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, opt, get_loss(loss), loss_weights),
                   donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})
    for _ in range(3):
        state, loss_v, _ = step(state, b["x"], b["y"], ())
    float(loss_v)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss_v, _ = step(state, b["x"], b["y"], ())
    assert np.isfinite(float(loss_v))
    return x.shape[0] * iters / (time.perf_counter() - t0)


def main(part: int = 0) -> None:
    """part: 0 = all, 1..4 = subset (each fits a short CI window)."""
    import jax
    import jax.numpy as jnp

    from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
        prepare_train_dict, synthetic_images, synthetic_signals)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        BCDUNet, NABNet, SEDUNet, SegModel, UNet1D)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        default_ds_weights)

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    B2 = 32 if on_tpu else 2
    S = 256 if on_tpu else 32
    results = {}
    rng = np.random.default_rng(0)

    want = lambda p: part in (0, p)
    # config 1: 1D UNet depth-3 width-32, 1024-sample signals
    x, y = synthetic_signals(256 if on_tpu else 8, length=1024)
    if want(1):
        m = getattr(UNet1D(1024, 3, 1, 32, 3, ds=0), "UNet")()
        m = m.replace(dtype=dt) if hasattr(m, "replace") else m
        results["1d_unet_d3_w32_L1024"] = measure(
            m, x[:B2 * 4], y[:B2 * 4], loss="MeanAbsoluteError")

    # config 2: 2D UNet / UNetE / UNetP 256^2 binary, transconv
    for dec in ("UNet", "UNetE", "UNetP"):
        if not want(1):
            break
        x2 = rng.normal(size=(B2, S, S, 3)).astype(np.float32)
        y2 = (rng.uniform(size=(B2, S, S, 1)) > 0.5).astype(np.float32)
        m = SegModel(decoder_name=dec, model_width=32, model_depth=4,
                     dtype=dt)
        results[f"2d_{dec}_{S}"] = measure(m, x2, y2)

    # config 3: UNet++ / UNet3+ multiclass with deep supervision
    for dec in ("UNetPP", "UNet3P"):
        if not want(2):
            break
        x2 = rng.normal(size=(B2, S, S, 3)).astype(np.float32)
        y2 = np.eye(4, dtype=np.float32)[
            rng.integers(0, 4, (B2, S, S))]
        # DS heads are exercised in the graph; only 'out' carries loss --
        # CCE on the 1-filter DS heads NaNs (in the reference's Keras
        # compile too, since a single loss is applied to every head)
        targets = {"out": y2}
        m = SegModel(decoder_name=dec, model_width=32, model_depth=4,
                     output_nums=4, ds=1, final_activation="softmax",
                     dtype=dt)
        results[f"2d_{dec}_ds_mc_{S}"] = measure(
            m, x2, targets, loss="CategoricalCrossentropy",
            loss_weights=default_ds_weights(4), lr=1e-4)

    # config 4: MultiResUNet + attention-guided UNet
    if want(3):
        x2 = rng.normal(size=(B2, S, S, 3)).astype(np.float32)
        y2 = (rng.uniform(size=(B2, S, S, 1)) > 0.5).astype(np.float32)
        m = SegModel(decoder_name="MultiResUNet", model_width=32,
                     model_depth=4, alpha=1.0, dtype=dt)
        results[f"2d_MultiResUNet_{S}"] = measure(m, x2, y2)
        m = SegModel(decoder_name="UNet", model_width=32, model_depth=4,
                     ag=1, dtype=dt)
        results[f"2d_UNet_AG_{S}"] = measure(m, x2, y2)

    # config 5: BCDUNet / SEDUNet (BiConvLSTM + SE) + EfficientNetB0 encoder
    if want(4):
        x1, y1 = synthetic_signals(B2 * 4, length=1024)
        m = BCDUNet(model_width=32, model_depth=3, lstm=1, dense_loop=2,
                    dtype=dt)
        results["1d_BCDUNet_lstm"] = measure(m, x1, y1,
                                             loss="MeanAbsoluteError")
        m = SEDUNet(model_width=32, model_depth=3, se_ratio=8, dtype=dt)
        results["1d_SEDUNet"] = measure(m, x1, y1, loss="MeanAbsoluteError")
        m = NABNet(model_width=32, model_depth=3, dense_loop=2, dtype=dt)
        results["1d_NABNet"] = measure(m, x1, y1, loss="MeanAbsoluteError")
    if want(5):
        x2 = rng.normal(size=(max(B2 // 2, 1), S, S, 3)).astype(np.float32)
        y2 = (rng.uniform(size=(max(B2 // 2, 1), S, S, 1)) > 0.5
              ).astype(np.float32)
        m = SegModel(decoder_name="UNet", model_width=32, model_depth=4,
                     train_mode="pretrained_encoder",
                     backbone="EfficientNetB0", dtype=dt)
        results[f"2d_UNet_EffNetB0_{S}"] = measure(m, x2, y2)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "RESULTS.json")
    payload = {"device": str(jax.devices()[0]),
               "unit": "images/sec/chip", "results": {}}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload["results"].update(
        {k: round(v, 2) for k, v in results.items()})
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    for k, v in results.items():
        print(f"{k:32s} {v:10.2f} img/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
