"""The whole 1D INI pipeline end-to-end (the reference's notebook-only
flow, 1D_Segmentation.ipynb cells 29-63, as the framework's driver
surface): synthesize .pt sets -> write a [SIGNAL1D] INI -> train1d ->
test1d (NILM report) -> export1d (StableHLO artifact) -> predict1d.

Every step here is also a CLI verb:
    tpuseg train1d / test1d / summary1d / export1d / serve1d / predict1d
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    save_pt, synthetic_signals)
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
    export_1d, predict_1d, summary_1d, test_1d, train_1d)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    Signal1DConfig, save_signal_config)


def main():
    x, y = synthetic_signals(32, length=256)
    y = np.abs(y)  # NILM power signals are nonnegative
    save_pt({"samples": x, "labels": y}, "/tmp/Train_Set.pt")
    save_pt({"samples": x[:8], "labels": y[:8]}, "/tmp/Test_Set.pt")

    cfg = Signal1DConfig(
        train_set="/tmp/Train_Set.pt", test_set="/tmp/Test_Set.pt",
        signal_length=256, num_channel=1,
        model_name="LDNet",          # any model_selector_1d name works
        model_depth=3, model_width=8, cardinality=2,
        d_s=0, batch_size=8, num_epochs=5, learning_rate=1e-3,
        monitor_param="loss", save_dir="/tmp/Results_1D_example",
        load_weights=False)
    save_signal_config(cfg, "/tmp/Signal_Configs.ini")  # CLI-ready INI

    summary_1d(config=cfg)
    train_1d(config=cfg)
    metrics = test_1d(config=cfg)
    print("NILM report:", metrics)
    export_1d(config=cfg, out_path="/tmp/ldnet.stablehlo")
    predict_1d(config=cfg, out_path="/tmp/preds.npz")


if __name__ == "__main__":
    main()
