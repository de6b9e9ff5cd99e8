"""Perf experiment: can rematerialization or bf16 optimizer moments buy a
larger batch than the b56 plateau (and more img/s/chip)?

Round-2 findings so far: step time plateaus ~208 ms over b48-b56, b60+
OOMs the remote compiler; remat at b32 was a loss (dots -12%, full -25%).
Hypothesis: remat/bf16-moments shrink live memory enough for b96+, and
throughput keeps scaling with batch past the plateau.

Usage: python benchmarks/batch_remat_sweep.py [variant ...]
  variant = "<batch>:<mode>[:<model>[:<accum>]]" with mode in {plain,
  dots, full, conv_outs, blockremat, bf16mu}, model in {unetpp (default), unet, unete, unetp,
  multires, agunet, unet3p, effb0, unet1d, bcdunet, sedunet}; accum =
  gradient-accumulation microbatch count (batch is the TOTAL effective
  batch, split into accum microbatches)
Prints one JSON line per variant (failures recorded, not fatal).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


#: 1D model names take (B, 1024, 1) signals and the reference's MAE loss
MODELS_1D = ("unet1d", "bcdunet", "sedunet")


def _build_model(name: str, dtype, block_remat: bool = False):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    import functools
    if block_remat:
        SegModel = functools.partial(SegModel, block_remat=True)
    if name in MODELS_1D:
        from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
            BCDUNet, SEDUNet, UNet1D)
        if name == "bcdunet":
            return BCDUNet(model_width=32, model_depth=3, lstm=1,
                           dense_loop=2, dtype=dtype)
        if name == "sedunet":
            return SEDUNet(model_width=32, model_depth=3, se_ratio=8,
                           dtype=dtype)
        m = getattr(UNet1D(1024, 3, 1, 32, 3, ds=0), "UNet")()
        return m.replace(dtype=dtype) if hasattr(m, "replace") else m
    if name in ("unete", "unetp"):
        return SegModel(decoder_name={"unete": "UNetE",
                                      "unetp": "UNetP"}[name],
                        model_width=32, model_depth=4, output_nums=1,
                        final_activation="sigmoid", dtype=dtype)
    if name == "effb0":
        return SegModel(decoder_name="UNet", backbone="EfficientNetB0",
                        train_mode="pretrained_encoder", model_width=32,
                        model_depth=4, output_nums=1,
                        final_activation="sigmoid", dtype=dtype)
    if name == "unet":
        return SegModel(decoder_name="UNet", model_width=32, model_depth=4,
                        output_nums=1, final_activation="sigmoid",
                        dtype=dtype)
    if name == "multires":
        return SegModel(decoder_name="MultiResUNet", model_width=32,
                        model_depth=4, output_nums=1,
                        final_activation="sigmoid", dtype=dtype)
    if name == "agunet":
        return SegModel(decoder_name="UNet", model_width=32, model_depth=4,
                        output_nums=1, ag=1, final_activation="sigmoid",
                        dtype=dtype)
    if name == "unet3p":
        return SegModel(decoder_name="UNet3P", model_width=32,
                        model_depth=4, output_nums=1,
                        final_activation="sigmoid", dtype=dtype)
    if name != "unetpp":
        raise ValueError(f"unknown model {name!r} (see module docstring)")
    return SegModel(decoder_name="UNetPP", model_width=32, model_depth=4,
                    output_nums=1, final_activation="sigmoid", dtype=dtype)


def run(batch: int, mode: str, model_name: str = "unetpp",
        accum: int = 1, cost_only: bool = None) -> dict:
    """``cost_only`` is not None -> also attach the compiled executable's
    XLA cost analysis under '_cost' (benchmarks/roofline.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        make_mesh, replicated, shard_batch)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        make_train_step)

    size = 256
    model = _build_model(model_name, jnp.bfloat16,
                         block_remat=mode == "blockremat")

    rng = np.random.default_rng(0)
    if model_name in MODELS_1D:
        x = rng.normal(size=(batch, 1024, 1)).astype(np.float32)
        y = rng.normal(size=(batch, 1024, 1)).astype(np.float32)
        loss_name = "MeanAbsoluteError"
    else:
        x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
        y = (rng.uniform(size=(batch, size, size, 1)) > 0.5
             ).astype(np.float32)
        loss_name = "BCEDiceLoss"

    mesh = make_mesh()
    optimizer = (optax.adam(1e-3, mu_dtype=jnp.bfloat16) if mode == "bf16mu"
                 else make_optimizer("Adam", 1e-3))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), optimizer)
    state = jax.device_put(state, replicated(mesh))
    # the framework's own step (so sweep numbers stay representative of
    # the shipped train path); remat modes map straight onto its arg
    train_step = make_train_step(
        model, optimizer, get_loss(loss_name),
        remat=mode if mode in ("dots", "full", "conv_outs") else None,
        accum_steps=accum)
    step = jax.jit(train_step, donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})
    for _ in range(3):
        state, loss, _ = step(state, b["x"], b["y"], ())
    float(loss)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _ = step(state, b["x"], b["y"], ())
    assert np.isfinite(float(loss))
    dt = time.perf_counter() - t0
    out = {"model": model_name, "batch": batch, "mode": mode,
           "accum": accum,
           "ips_per_chip": round(batch * iters / dt, 2),
           "step_ms": round(dt / iters * 1e3, 2)}
    if cost_only is not None:
        cost = step.lower(state, b["x"], b["y"], ()).compile(
            ).cost_analysis()
        out["_cost"] = cost[0] if isinstance(cost, (list, tuple)) else cost
    return out


def main():
    variants = sys.argv[1:] or ["56:plain", "64:plain", "64:bf16mu",
                                "96:dots", "112:dots", "112:full"]
    for v in variants:
        parts = v.split(":")
        b, m = int(parts[0]), parts[1]
        name = parts[2] if len(parts) > 2 else "unetpp"
        acc = int(parts[3]) if len(parts) > 3 else 1
        try:
            print(json.dumps(run(b, m, name, acc)), flush=True)
        except Exception as e:  # noqa: BLE001 — record OOMs and move on
            print(json.dumps({"model": name, "batch": b, "mode": m,
                              "accum": acc,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
