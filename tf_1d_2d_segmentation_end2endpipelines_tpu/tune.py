"""On-device batch-size / remat autotuner (CLI verb ``tpuseg tune``).

The reference exposes ``batch_size`` as a config key and leaves picking it
to the user (Train_Configs.ini:33); on TPU the choice is worth 2-3x
throughput and is non-obvious — the measured zoo-wide rule (docs/SCALING.md)
is: try the PLAIN step at aligned batches first, and reach for
``remat='dots'`` only to unlock batches whose plain step fails to compile
or OOMs.  This module automates exactly that sweep against the user's own
INI model/config on the actual device, using the shipped train step (so
numbers are representative of training, not a synthetic kernel), and can
write the winning ``batch_size``/``remat`` back into the INI.

Each candidate is timed over ``steps`` steady-state steps after ``warmup``
compile+burn-in steps; failures (remote-compiler rejection, HBM OOM) are
recorded per-variant and the sweep continues — a larger batch failing does
NOT imply every larger batch fails (b60/b64 fail where b128 compiles; see
PROGRESS.md round-2 log), so nothing is pruned.

Timing note: under the axon TPU tunnel ``block_until_ready`` does not
fence; the timed window ends with a host fetch of the dependent loss
scalar instead.
"""
from __future__ import annotations

import configparser
import json
import os
import time
import typing as tp

import numpy as np

__all__ = ["tune", "tune_main"]

#: aligned 2D candidates (v5e measured sweet spots; 8-lane multiples)
DEFAULT_BATCHES_2D = (32, 64, 96, 128)
#: 1D signals are ~100x smaller per sample; peak measured at b512
DEFAULT_BATCHES_1D = (128, 256, 512, 1024)


def _is_signal_config(path: str) -> bool:
    parser = configparser.ConfigParser()
    with open(path) as f:
        parser.read_file(f)
    return parser.has_section("SIGNAL1D")


def _synth_batch(cfg, batch: int, signal: bool):
    """Synthesize one (x, targets) training batch at the config's shapes
    (binary/regression masks; DS configs get the label pyramid the real
    driver builds)."""
    rng = np.random.default_rng(0)
    if signal:
        x = rng.normal(size=(batch, cfg.signal_length, cfg.num_channel)
                       ).astype(np.float32)
        y = rng.normal(size=(batch, cfg.signal_length, cfg.output_nums)
                       ).astype(np.float32)
        if cfg.problem_type.lower() == "classification":
            y = (y > 0).astype(np.float32)
        from .drivers_1d import _wrap_targets_1d
        return x, _wrap_targets_1d(y, cfg)
    x = rng.normal(size=(batch, cfg.imlength, cfg.imwidth,
                         cfg.num_channels)).astype(np.float32)
    n_out = max(cfg.output_nums, cfg.class_number, 1)
    y = (rng.uniform(size=(batch, cfg.imlength, cfg.imwidth, n_out))
         > 0.5).astype(np.float32)
    from .drivers import _wrap_targets
    return x, _wrap_targets(y, cfg)


def _measure(cfg, batch: int, mode: str, signal: bool,
             steps: int, warmup: int) -> dict:
    import jax

    from .parallel import make_mesh, replicated, shard_batch
    from .train import create_train_state, get_loss, make_optimizer
    from .train.state import make_train_step

    if signal:
        from .drivers_1d import _build_model_1d
        model = _build_model_1d(cfg)
    else:
        from .drivers import _build_model
        model = _build_model(cfg)

    x, y = _synth_batch(cfg, batch, signal)
    from .drivers import _training_mesh
    mesh = _training_mesh(cfg) or make_mesh()
    optimizer = make_optimizer(cfg.optimizer_function, cfg.learning_rate)
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed),
                               np.asarray(x[:1]), optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(
        make_train_step(model, optimizer, get_loss(cfg.loss_function),
                        remat=mode if mode in ("dots", "full") else None,
                        accum_steps=getattr(cfg, "accumulation_steps", 1)),
        donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})
    for _ in range(max(warmup, 1)):
        state, loss, _ = step(state, b["x"], b["y"], ())
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss, _ = step(state, b["x"], b["y"], ())
    if not np.isfinite(float(loss)):  # the host fetch is the fence
        raise FloatingPointError("non-finite loss during tuning sweep")
    dt = time.perf_counter() - t0
    return {"batch": batch, "mode": mode,
            "ips": round(batch * steps / dt, 2),
            "step_ms": round(dt / steps * 1e3, 2)}


def tune(config_path: str,
         batches: tp.Optional[tp.Sequence[int]] = None,
         modes: tp.Optional[tp.Sequence[str]] = None,
         steps: int = 20, warmup: int = 3,
         write: bool = False) -> dict:
    """Sweep batch x remat on the device and return the winner.

    ``modes=None`` applies the measured heuristic: plain first, 'dots'
    only for batches whose plain step fails.  Explicit ``modes`` forces
    every (batch, mode) combination.  ``write=True`` updates the INI's
    ``batch_size`` (+ ``remat``) in place.
    """
    signal = _is_signal_config(config_path)
    if signal:
        from .utils.config import load_signal_config
        cfg = load_signal_config(config_path)
    else:
        from .utils.config import load_train_config
        cfg = load_train_config(config_path)

    cand = tuple(batches) if batches else (
        DEFAULT_BATCHES_1D if signal else DEFAULT_BATCHES_2D)
    heuristic = modes is None
    mode_list = ("plain",) if heuristic else tuple(modes)

    results: tp.List[dict] = []
    for bsz in cand:
        plain_ok = False
        for mode in mode_list:
            try:
                r = _measure(cfg, bsz, mode, signal, steps, warmup)
                results.append(r)
                plain_ok = plain_ok or mode == "plain"
            except Exception as e:  # noqa: BLE001 — OOM/compiler: record
                results.append({"batch": bsz, "mode": mode,
                                "error": f"{type(e).__name__}: {e}"[:300]})
            print(json.dumps(results[-1]), flush=True)
        if heuristic and not plain_ok:
            # the documented rule: remat only to unlock batches the
            # plain step can't fit (docs/SCALING.md)
            try:
                r = _measure(cfg, bsz, "dots", signal, steps, warmup)
                results.append(r)
            except Exception as e:  # noqa: BLE001
                results.append({"batch": bsz, "mode": "dots",
                                "error": f"{type(e).__name__}: {e}"[:300]})
            print(json.dumps(results[-1]), flush=True)

    ok = [r for r in results if "ips" in r]
    report = {"config": config_path, "signal": signal, "results": results}
    if not ok:
        report["winner"] = None
        print(json.dumps({"winner": None,
                          "note": "every candidate failed"}), flush=True)
        return report
    best = max(ok, key=lambda r: r["ips"])
    report["winner"] = best
    print(json.dumps({"winner": best}), flush=True)

    if write:
        _write_back(config_path, best, signal)
        print(f"wrote batch_size={best['batch']} remat="
              f"{'' if best['mode'] == 'plain' else best['mode']} "
              f"to {config_path}", flush=True)
    return report


def _write_back(config_path: str, best: dict, signal: bool) -> None:
    """Update only batch_size/remat in place, preserving other keys."""
    section = "SIGNAL1D" if signal else "TRAIN"
    parser = configparser.ConfigParser()
    with open(config_path) as f:
        parser.read_file(f)
    parser[section]["batch_size"] = str(best["batch"])
    parser[section]["remat"] = ("" if best["mode"] == "plain"
                                else best["mode"])
    tmp = config_path + ".tmp"
    with open(tmp, "w") as f:
        parser.write(f)
    os.replace(tmp, config_path)


def tune_main(args) -> dict:
    batches = ([int(b) for b in args.batches.split(",") if b.strip()]
               if args.batches else None)
    modes = ([m.strip() for m in args.modes.split(",") if m.strip()]
             if args.modes else None)
    return tune(args.config, batches=batches, modes=modes,
                steps=args.steps, warmup=args.warmup, write=args.write)
