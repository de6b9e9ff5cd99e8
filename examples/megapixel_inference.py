"""Megapixel / long-signal inference over the device mesh.

The reference handles large inputs by host-side patchify -> per-patch
``model.predict`` -> unpatchify (Test.py:149-159) and trains 21600-sample
signals at batch 1 (1D notebook cell 29).  This framework gives three
mesh-native equivalents, demonstrated here end-to-end:

1. patch-grid sharding  — every patch in ONE jitted call, the grid split
   over the mesh's 'data' axis, overlap-averaged on the host;
2. halo-sharded forward — the image's H axis sharded over the mesh, one
   up-front ppermute halo exchange, the FULL model per shard: exactly
   seam-free (no patch boundaries at all);
3. 1D window sharding   — a long signal's windows as the mesh batch.

Runs anywhere: `JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python examples/megapixel_inference.py`
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    local_mesh, sharded_patch_inference, sharded_window_inference)
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel.halo import (
    halo_sharded_inference)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer


def main() -> None:
    mesh = local_mesh()
    print(f"mesh: {dict(mesh.shape)}")
    rng = np.random.default_rng(0)

    # ---- 2D: one large image ----
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=2,
                     final_activation="sigmoid")
    image = rng.normal(size=(512, 512, 3)).astype(np.float32)
    tr = Trainer(model)
    tr.init_state(image[None, :64, :64])
    tr._build_steps()

    pred_patches = sharded_patch_inference(
        tr._predict_step, tr.state, image, patch=128, overlap_ratio=0.5,
        mesh=mesh)
    print(f"patch-grid sharded prediction: {pred_patches.shape}")

    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    pred_halo = halo_sharded_inference(model, variables, image, mesh,
                                       halo=64)
    print(f"halo-sharded (seam-free) prediction: {pred_halo.shape}")

    # ---- 1D: one long signal ----
    model1d = SegModel(decoder_name="UNet", model_width=8, model_depth=2,
                       final_activation="sigmoid")
    signal = rng.normal(size=(21600, 1)).astype(np.float32)
    tr1 = Trainer(model1d)
    tr1.init_state(signal[None, :256])
    tr1._build_steps()
    pred_sig = sharded_window_inference(
        tr1._predict_step, tr1.state, signal, window=256,
        overlap_ratio=0.5, mesh=mesh)
    print(f"window-sharded signal prediction: {pred_sig.shape}")


if __name__ == "__main__":
    main()
