"""1D signal segmentation end-to-end (the reference 1D notebook flow,
1D_Segmentation.ipynb cells 29-64): .pt dataset -> LDNet/UNet -> MAE loss
with deep-supervision weights -> fit -> NILM evaluation."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    batches, prepare_train_dict, save_pt, load_signal_dataset,
    synthetic_signals)
from tf_1d_2d_segmentation_end2endpipelines_tpu.eval import (
    calculate_deoi, calculate_ea, calculate_jeoi, calculate_sae,
    construction_error)
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import UNet1D
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    EarlyStopping, ReduceLROnPlateau, Trainer, default_ds_weights)


def main():
    # synthesize + round-trip through the reference's .pt format
    x, y = synthetic_signals(64, length=1024)
    save_pt({"samples": x, "labels": y}, "/tmp/Train_Set.pt")
    x, y = load_signal_dataset("/tmp/Train_Set.pt")

    depth = 3
    model = UNet1D(1024, depth, 1, 16, 3, problem_type="Regression",
                   output_nums=1, ds=1).UNet()
    targets = {k: np.asarray(v) for k, v in
               prepare_train_dict(y, depth, ds_type="UNet").items()}

    tr = Trainer(model, loss="MeanAbsoluteError", optimizer="Adam",
                 learning_rate=3e-4, metrics=("MeanSquaredError",),
                 loss_weights=default_ds_weights(depth))
    tr.init_state(x[:4])
    tr.fit(batches(x, targets, 8),
           epochs=10,
           callbacks=[EarlyStopping(monitor="loss", patience=5),
                      ReduceLROnPlateau(monitor="loss", factor=0.5,
                                        patience=3)])

    pred = tr.predict(x[:16])["out"]
    print("Construction:", construction_error(y[:16], pred))
    print("SAE:", calculate_sae(np.abs(y[:16]) + 1e-3, np.abs(pred)))
    print("EA:", calculate_ea(np.abs(y[:16]) + 1e-3, np.abs(pred)))
    print("JEOI:", calculate_jeoi(y[:16], pred))
    print("DEOI:", calculate_deoi(y[:16], pred))


if __name__ == "__main__":
    main()
