"""The COMPLETE 2D INI pipeline, end-to-end — the reference's notebook
driver flow (2D_Segmentation_TF.ipynb: preprocess -> create_folds ->
augment xN -> write Train_Configs.ini -> %run -m train -> write
Test_Configs.ini -> %run -m test -> predictions) as one runnable script
on a tiny synthetic dataset.

Every stage goes through the same public surfaces a real run uses: the
data tooling (`create_folds`, `augment_dataset`), the INI config
round-trip, and the CLI driver functions (`drivers.train/test/predict`).

Run: python examples/image_pipeline_ini.py   (CPU-friendly, ~2-4 min)
"""
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (  # noqa: E402
    augment_dataset, create_folds)
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (  # noqa: E402
    predict as run_predict, test as run_test, train as run_train)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (  # noqa: E402
    TestConfig, TrainConfig, load_test_config, load_train_config,
    save_test_config, save_train_config)


def synthesize_raw_dataset(root: str, n: int = 10, size: int = 32) -> None:
    """Stand-in for the notebook's raw download + CLAHE stage: blobs on
    noise, mask = the blob."""
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    for i in range(n):
        img = rng.uniform(40, 90, (size, size, 3))
        msk = np.zeros((size, size), np.uint8)
        cy, cx = rng.integers(8, size - 8, 2)
        yy, xx = np.mgrid[:size, :size]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < rng.integers(3, 7) ** 2
        img[blob] += 120.0
        msk[blob] = 255
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(root, "images", f"im_{i:03d}.png"))
        Image.fromarray(msk).save(
            os.path.join(root, "masks", f"im_{i:03d}.png"))


def main() -> None:
    work = tempfile.mkdtemp(prefix="tpuseg_2d_pipeline_")
    raw = os.path.join(work, "Raw")
    data = os.path.join(work, "Data")
    results = os.path.join(work, "Results")
    print(f"workdir: {work}")

    # 1. raw data (notebook: gdown + CLAHE preprocessing)
    synthesize_raw_dataset(raw)

    # 2. fold split (notebook cell: create_folds)
    create_folds(os.path.join(raw, "images"), os.path.join(raw, "masks"),
                 data, num_folds=1, test_portion=0.2, val_portion=0.2)

    # 3. offline augmentation x2 on the TRAIN fold (notebook: augment)
    train_fold = os.path.join(data, "Train", "fold_1")
    written = augment_dataset(os.path.join(train_fold, "images"),
                              os.path.join(train_fold, "masks"),
                              num_copies=2)
    print(f"augment: wrote {len(written)} augmented images")

    # 4. write + reload Train_Configs.ini (notebook cell 47)
    cfg = TrainConfig(
        train_dir=train_fold,
        val_dir=os.path.join(data, "Val", "fold_1"),
        imlength=32, imwidth=32, model_genre="UNet", decoder_name="UNetPP",
        model_width=4, model_depth=2, batch_size=4, num_epochs=3,
        learning_rate=1e-3, loss_function="BCEDiceLoss",
        metric_list=("BinaryAccuracy",), monitor_param="val_loss",
        save_dir=results, load_weights=False,
        clipnorm=1.0,          # production knobs, straight from the INI
        ema_decay=0.5,
    )
    ini = os.path.join(work, "Train_Configs.ini")
    save_train_config(cfg, ini)
    histories = run_train(config=load_train_config(ini))
    print(f"train: final loss {histories[1]['loss'][-1]:.4f}")

    # 5. write + reload Test_Configs.ini, run the test driver
    tcfg = TestConfig(test_dir=os.path.join(data, "Test", "fold_1"),
                      imheight=32, imwidth=32, decoder_name="UNetPP",
                      class_number=1, threshold=0.5, save_dir=results)
    tini = os.path.join(work, "Test_Configs.ini")
    save_test_config(tcfg, tini)
    reports = run_test(config=load_test_config(tini),
                       train_config=load_train_config(ini))
    print(f"test: overall accuracy "
          f"{reports[1]['overall_accuracy']:.2f}% "
          f"(report at {results}/test_results/fold_1)")

    # 6. pure inference on unlabeled images (no reference equivalent)
    masks_out = os.path.join(work, "predicted")
    written_masks = run_predict(config_path=load_train_config(ini),
                                input_path=os.path.join(train_fold,
                                                        "images"),
                                out_dir=masks_out, fold=1)
    print(f"predict: {len(written_masks)} masks -> {masks_out}")
    print("2D INI pipeline complete.")


if __name__ == "__main__":
    main()
