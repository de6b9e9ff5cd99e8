"""A/B the native image loader (native/imgio.cpp) against the PIL path.

The reference's input pipeline is synchronous per-image PIL
(DataGenerator.py:68-114); this framework already overlaps decodes with
device compute (PrefetchLoader), so this benchmark measures the per-image
decode cost itself — the quantity that bounds host-side input throughput
once overlap is in place.  Run: python benchmarks/native_io_bench.py
"""
import json
import os
import tempfile
import time

import numpy as np
from PIL import Image

from tf_1d_2d_segmentation_end2endpipelines_tpu.native.imgio import (
    get_lib, load_image_native)


def _bench(fn, n=50):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    assert get_lib() is not None, "native imgio failed to build"
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    jpg = os.path.join(tmp, "img.jpg")
    png = os.path.join(tmp, "img.png")
    msk = os.path.join(tmp, "msk.png")
    pre = os.path.join(tmp, "pre.png")  # already at target size
    Image.fromarray(rng.integers(0, 256, (512, 512, 3),
                                 dtype=np.uint8)).save(jpg, quality=90)
    Image.fromarray(rng.integers(0, 256, (512, 512, 3),
                                 dtype=np.uint8)).save(png)
    Image.fromarray(((rng.uniform(0, 1, (512, 512)) > 0.5) * 255)
                    .astype(np.uint8)).save(msk)
    Image.fromarray(rng.integers(0, 256, (256, 256, 3),
                                 dtype=np.uint8)).save(pre)

    cases = [
        ("jpg512->256_rgb_lanczos", jpg, "rgb", "lanczos"),
        ("png512->256_rgb_lanczos", png, "rgb", "lanczos"),
        ("maskpng512->256_gray_nearest", msk, "grayscale", "nearest"),
        ("png256_noresize_rgb", pre, "rgb", "lanczos"),
    ]
    results = {}
    for name, path, cm, res in cases:
        t_nat = _bench(
            lambda: load_image_native(path, (256, 256), cm, res, 255.0))

        def pil():
            img = Image.open(path).convert(
                "L" if cm == "grayscale" else "RGB")
            if img.size != (256, 256):
                img = img.resize((256, 256),
                                 Image.LANCZOS if res == "lanczos"
                                 else Image.NEAREST)
            a = np.asarray(img, np.float32)
            a = a[..., None] if a.ndim == 2 else a
            return a / np.float32(255.0)

        t_pil = _bench(pil)
        results[name] = {"native_ms": round(t_nat, 3),
                         "pil_ms": round(t_pil, 3),
                         "speedup": round(t_pil / t_nat, 3)}
        print(f"{name}: native {t_nat:.2f} ms  PIL {t_pil:.2f} ms  "
              f"{t_pil / t_nat:.2f}x")
    print(json.dumps(results))


if __name__ == "__main__" and "--loader" not in __import__("sys").argv:
    main()


def loader_epoch_bench():
    """Loader-level A/B: epoch wall time over a 64-image 512->256 dataset
    through PrefetchLoader — PIL vs native decode vs cached epochs.
    Run: python benchmarks/native_io_bench.py --loader"""
    import shutil
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.generators import (
        PrefetchLoader, SegmentationFolderDataset)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp()
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(tmp, sub), exist_ok=True)
    for i in range(64):
        Image.fromarray(rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
                        ).save(os.path.join(tmp, "images", f"{i}.png"))
        Image.fromarray(((rng.uniform(0, 1, (512, 512)) > 0.5) * 255)
                        .astype(np.uint8)
                        ).save(os.path.join(tmp, "masks", f"{i}.png"))
    ds = SegmentationFolderDataset(tmp, (256, 256))

    def epoch(loader):
        n = 0
        for x, y in loader():
            n += x.shape[0]
        return n

    results = {}
    for label, env, cache in (("pil", "0", False),
                              ("native", "1", False),
                              ("native+cache(ep2)", "1", True)):
        os.environ["TPUSEG_NATIVE_IO"] = env
        import tf_1d_2d_segmentation_end2endpipelines_tpu.native.imgio as m
        m.reset()
        loader = PrefetchLoader(ds, 8, shuffle=False, cache=cache)
        epoch(loader)  # warm (and fills the cache when enabled)
        t0 = time.perf_counter()
        epoch(loader)
        dt = time.perf_counter() - t0
        results[label] = round(dt * 1e3, 1)
        print(f"{label}: {dt * 1e3:.0f} ms/epoch ({64 / dt:.1f} img/s)")
    os.environ.pop("TPUSEG_NATIVE_IO", None)
    shutil.rmtree(tmp)
    print(json.dumps(results))


if __name__ == "__main__" and "--loader" in __import__("sys").argv:
    loader_epoch_bench()
