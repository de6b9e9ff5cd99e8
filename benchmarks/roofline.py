"""Roofline arithmetic for a train step: XLA cost-analysis FLOPs and
bytes-accessed of the COMPILED executable vs the chip's peak MXU rate and
HBM bandwidth (round-5 verdict item 6: make the "bandwidth-bound" claim
checkable).

Usage: python benchmarks/roofline.py [variant ...]   (same variant syntax
as batch_remat_sweep: "<batch>:<mode>[:<model>]")

Prints one JSON line per variant: measured step ms, analytic flop-bound
ms (flops/peak), analytic bandwidth-bound ms (bytes/bw), mfu, hbm_util.
Bytes-accessed is XLA's post-fusion model of HBM traffic (each fusion's
operand+output buffers), not a hardware counter — treat ratios near 1.0
as "at the modelled bound", not as exact.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

#: v5e: 197 TFLOP/s bf16 MXU peak, 819 GB/s HBM (public TPU v5e specs;
#: same table bench.py uses for mfu)
PEAKS = {"v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
         "v4": (275e12, 1228e9), "v5p": (459e12, 2765e9),
         "v6 lite": (918e12, 1640e9), "v6e": (918e12, 1640e9)}


def main():
    import jax

    from batch_remat_sweep import run

    kind = jax.devices()[0].device_kind.lower()
    peak_flops, peak_bw = next(
        (v for k, v in sorted(PEAKS.items(), key=lambda kv: -len(kv[0]))
         if k in kind), (None, None))

    variants = sys.argv[1:] or ["128:plain:unetpp", "128:plain:multires",
                                "128:plain:unet3p"]
    for v in variants:
        parts = v.split(":")
        b, m = int(parts[0]), parts[1]
        name = parts[2] if len(parts) > 2 else "unetpp"
        res = run(b, m, name, cost_only=False)
        cost = res.pop("_cost", None)
        if cost is None or peak_flops is None:
            print(json.dumps({**res, "error": "no cost analysis"}))
            continue
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        step_s = res["step_ms"] / 1e3
        out = {
            **res,
            "flops_e12": round(flops / 1e12, 2),
            "bytes_gb": round(bytes_acc / 2**30, 2),
            "flop_bound_ms": round(flops / peak_flops * 1e3, 2),
            "bw_bound_ms": round(bytes_acc / peak_bw * 1e3, 2),
            "mfu": round(flops / step_s / peak_flops, 3),
            "hbm_util": round(bytes_acc / step_s / peak_bw, 3),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
