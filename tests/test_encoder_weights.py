"""The driver's ``encoder_weights`` INI key: the reference hardcodes
``weights='imagenet'`` in every keras.applications ctor
(unet_variants.py:1057,1520,2361...); the INI driver must load those
weights into the fold's initial TrainState (round-5: previously the
pretrained-encoder structure trained from RANDOM weights).

Values: 'imagenet' (network or $KERAS_HOME/models cache), a local
.weights.h5 path (the offline recipe, MIGRATION.md), or 'none'.
"""
import glob
import os

import numpy as np
import pytest
from PIL import Image

tf = pytest.importorskip("tensorflow")

# builds keras.applications graphs -> session-boundary lane
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("TPUSEG_FULL_TESTS"),
                       reason="Keras-build fixture "
                              "(set TPUSEG_FULL_TESTS=1)"),
]

from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (  # noqa: E402
    _build_model, _encoder_init_variables)
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (  # noqa: E402
    train as run_train)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (  # noqa: E402
    TrainConfig)


def _cfg(tmp_path, **kw):
    return TrainConfig(
        train_dir=str(tmp_path / "Data" / "Train"),
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", model_genre="UNet",
        encoder_mode="pretrained_encoder", encoder_name="ResNet50",
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        loss_function="BCEDiceLoss", metric_list=("BinaryAccuracy",),
        monitor_param="loss", save_dir=str(tmp_path / "Results"),
        start_fold=1, end_fold=1, load_weights=False, **kw)


def _write_dataset(root, n=4, size=32):
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        img = rng.uniform(0, 255, (size, size, 3)).astype(np.uint8)
        msk = np.zeros((size, size), np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"{i}.png"))
        Image.fromarray(msk).save(os.path.join(root, "masks", f"{i}.png"))


def _save_random_resnet50(tmp_path):
    """A local .weights.h5 exactly like a user's pre-downloaded file
    (weights=None: random values stand in for the ImageNet tensors)."""
    kmodel = tf.keras.applications.ResNet50(
        include_top=False, weights=None, input_shape=(32, 32, 3))
    path = str(tmp_path / "resnet50_offline.weights.h5")
    kmodel.save_weights(path)
    return path


def test_local_h5_substitutes_backbone_weights(tmp_path):
    """encoder_weights=<path> must put the CONVERTED Keras weights (not a
    random init) into the state's backbone subtree."""
    path = _save_random_resnet50(tmp_path)
    cfg = _cfg(tmp_path, encoder_weights=path)
    model = _build_model(cfg)
    sample = np.zeros((1, 32, 32, 3), np.float32)
    got = _encoder_init_variables(cfg, model, sample, resuming=False)
    assert got is not None
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (  # noqa: E501
        load_backbone_weights)
    bb = get_backbone("ResNet50", max_tap=2)
    want, _ = load_backbone_weights("ResNet50", bb, sample, weights=path)
    key = next(k for k in got["params"] if "Backbone" in k)
    import jax
    for a, b in zip(jax.tree.leaves(got["params"][key]),
                    jax.tree.leaves(want["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # 'none' opts out: random init (differs from the converted stem)
    cfg_none = _cfg(tmp_path, encoder_weights="none")
    assert _encoder_init_variables(cfg_none, model, sample, False) is None


def test_driver_trains_with_local_h5(tmp_path):
    _write_dataset(str(tmp_path / "Data" / "Train"))
    path = _save_random_resnet50(tmp_path)
    hist = run_train(config=_cfg(tmp_path, encoder_weights=path))
    assert 1 in hist and np.isfinite(hist[1]["loss"][0])


def test_bad_weights_path_errors_with_recipe(tmp_path):
    cfg = _cfg(tmp_path, encoder_weights=str(tmp_path / "missing.weights.h5"))
    model = _build_model(cfg)
    sample = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(RuntimeError, match="MIGRATION.md"):
        _encoder_init_variables(cfg, model, sample, resuming=False)


def test_resuming_fold_skips_encoder_load(tmp_path):
    """A resuming fold must not touch the network/cache at all."""
    cfg = _cfg(tmp_path, encoder_weights="imagenet")  # would fail offline
    model = _build_model(cfg)
    sample = np.zeros((1, 32, 32, 3), np.float32)
    assert _encoder_init_variables(cfg, model, sample, resuming=True) is None


_CACHE = os.path.join(os.environ.get("KERAS_HOME",
                                     os.path.expanduser("~/.keras")),
                      "models")


@pytest.mark.skipif(
    not glob.glob(os.path.join(_CACHE, "resnet50*notop.h5")),
    reason="no keras.applications ImageNet cache on this host "
           "(pre-download per MIGRATION.md to enable)")
def test_imagenet_from_cache(tmp_path):
    """With the keras cache present, encoder_weights='imagenet' loads the
    real ImageNet tensors without network (the pre-cache recipe)."""
    cfg = _cfg(tmp_path, encoder_weights="imagenet")
    model = _build_model(cfg)
    sample = np.zeros((1, 32, 32, 3), np.float32)
    got = _encoder_init_variables(cfg, model, sample, resuming=False)
    assert got is not None
