"""Capture a device trace of the flagship train step and print a per-op
category breakdown (the profile-first rule's tooling; round-2 profiles
drove every accepted/rejected optimization).

Usage: python benchmarks/profile_step.py [batch] [remat] [decoder] [width] [ops_n]
Writes the trace under /tmp/tpuseg_profile and prints ms/step by fused-op
category.  ``decoder`` (default UNetPP) profiles any SegModel family at
its zoo config (e.g. MultiResUNet, UNet3P — the round-4 targets).
``ops_n`` > 0 additionally prints the top-N INDIVIDUAL ops with their
XLA source / model-path metadata — this view (not the category rollup)
is what attributed MultiResUNet's step to the level-1 ResPath BN-backward
reductions and exposed the batch-minor T(8,128) layouts (round 5).

Run ONE process at a time on the axon tunnel: a concurrent process
squeezes compile-time HBM and the compiler silently emits a many-times-
slower auto-remat executable (observed 15x on MultiResUNet b128).
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        make_mesh, replicated, shard_batch)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        make_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    remat = sys.argv[2] if len(sys.argv) > 2 else "dots"
    decoder = sys.argv[3] if len(sys.argv) > 3 else "UNetPP"
    width = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    ops_n = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    size = 256
    steps = 3
    model = SegModel(decoder_name=decoder, model_width=width, model_depth=4,
                     output_nums=1, final_activation="sigmoid",
                     dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, size, size, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch, size, size, 1)) > 0.5).astype(np.float32)
    mesh = make_mesh()
    opt = make_optimizer("Adam", 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), opt)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, opt, get_loss("BCEDiceLoss"),
                                   remat=remat or None),
                   donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})
    for _ in range(3):
        state, loss, _ = step(state, b["x"], b["y"], ())
    float(loss)

    outdir = "/tmp/tpuseg_profile"
    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        state, loss, _ = step(state, b["x"], b["y"], ())
    float(loss)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(outdir + "/**/*.trace.json.gz",
                              recursive=True))
    if not traces:
        raise SystemExit(f"no trace file produced under {outdir}")
    with gzip.open(traces[-1]) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    cat = collections.Counter()
    per_op = collections.Counter()
    op_meta = {}
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            n = e["name"]
            if n.startswith("jit_") or n.isdigit():
                continue
            cat[re.sub(r"\.\d+(\.remat\d*)?$", "", n)] += e.get("dur", 0)
            if ops_n:
                per_op[n] += e.get("dur", 0)
                if n not in op_meta:
                    a = e.get("args", {})
                    op_meta[n] = (a.get("tf_op", ""), a.get("source", ""))
    tot = sum(cat.values())
    if not tot:
        raise SystemExit("no TPU device events in the trace (CPU-only "
                         "host?) — run this on the TPU tunnel")
    print(f"batch={batch} remat={remat or 'none'}: "
          f"{tot / steps / 1e3:.1f} ms/step device-op time "
          f"({batch * steps * 1e6 / tot:.1f} img/s)")
    for name, d in cat.most_common(15):
        print(f"  {d / steps / 1e3:8.2f} ms/step  {name}")
    if ops_n:
        print(f"\ntop {ops_n} individual ops (model path | XLA source):")
        for name, d in per_op.most_common(ops_n):
            tf_op, source = op_meta[name]
            # strip the jit(train_step)/ prefix; keep the model path
            tf_op = re.sub(r"^jit\([^)]*\)/", "", tf_op)
            print(f"  {d / steps / 1e3:8.2f}  {name}\n"
                  f"            {tf_op}  [{source.rsplit('/', 1)[-1]}]")
    print(f"trace: {traces[-1]}")


if __name__ == "__main__":
    main()
