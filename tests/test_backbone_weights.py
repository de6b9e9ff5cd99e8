"""Keras.applications weight conversion: VGG16 tap-level parity."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def test_vgg16_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("VGG16")
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("VGG16", bb, x, weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    # reference tap names (unet_variants.py:1520-1549)
    names = ["block2_conv2", "block3_conv3", "block4_conv3", "block5_conv3",
             "block5_pool"]
    kref = tf.keras.Model(
        kmodel.input, [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        diff = float(np.max(np.abs(got - ref)))
        assert got.shape == ref.shape, name
        assert diff < 1e-4, f"{name}: {diff}"


def test_densenet121_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("DenseNet121")
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("DenseNet121", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["conv1/relu", "pool2_relu", "pool3_relu", "pool4_relu", "relu"]
    # keras 3 renames conv1/relu -> conv1_relu
    resolved = []
    for n in names:
        try:
            resolved.append(kmodel.get_layer(n).output)
        except ValueError:
            resolved.append(kmodel.get_layer(n.replace("/", "_")).output)
    kref = tf.keras.Model(kmodel.input, resolved)
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-4, f"{name}: {diff}"


def test_resnet50_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("ResNet50")
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("ResNet50", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["conv1_relu", "conv2_block3_out", "conv3_block4_out",
             "conv4_block6_out", "conv5_block3_out"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-3, f"{name}: {diff}"


def test_mobilenetv2_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("MobileNetV2")
    x = np.random.default_rng(3).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("MobileNetV2", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["block_1_expand_relu", "block_3_expand_relu",
             "block_6_expand_relu", "block_13_expand_relu", "out_relu"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-3, f"{name}: {diff}"


def test_efficientnetb0_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("EfficientNetB0")
    x = (np.random.default_rng(4).uniform(0, 255, (1, 64, 64, 3))
         ).astype(np.float32)
    variables, kmodel = load_backbone_weights("EfficientNetB0", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["block2a_expand_activation", "block3a_expand_activation",
             "block4a_expand_activation", "block6a_expand_activation",
             "top_activation"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-3, f"{name}: {diff}"


def test_init_segmodel_with_imagenet_structure():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.pretrained_init import (
        init_segmodel_with_imagenet)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=4,
                     train_mode="pretrained_encoder", backbone="VGG16")
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables = init_segmodel_with_imagenet(model, x, weights=None)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["out"].shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out["out"])).all()


def test_mobilenet_v1_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("MobileNet")
    x = np.random.default_rng(5).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("MobileNet", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["conv_pw_1_relu", "conv_pw_3_relu", "conv_pw_5_relu",
             "conv_pw_11_relu", "conv_pw_13_relu"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-3, f"{name}: {diff}"


def test_efficientnetv2b0_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("EfficientNetV2B0")
    x = (np.random.default_rng(6).uniform(0, 255, (1, 64, 64, 3))
         ).astype(np.float32)
    variables, kmodel = load_backbone_weights("EfficientNetV2B0", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["block1a_project_activation", "block2b_expand_activation",
             "block4a_expand_activation", "block6a_expand_activation",
             "top_activation"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < 1e-3, f"{name}: {diff}"


def test_resnet50v2_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("ResNet50V2")
    x = np.random.default_rng(8).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kmodel = load_backbone_weights("ResNet50V2", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    # stage taps are two-tensor concats (unet_variants.py:1288-1319)
    pair = ["conv2_block3_1_relu", "conv2_block3_preact_relu"]
    refs = [np.asarray(t) for t in tf.keras.Model(
        kmodel.input, [kmodel.get_layer(n).output for n in pair])(
        x, training=False)]
    got = np.asarray(taps[2])
    np.testing.assert_allclose(got, np.concatenate(refs, -1), atol=1e-4)
    ref_post = np.asarray(tf.keras.Model(
        kmodel.input, kmodel.get_layer("post_relu").output)(
        x, training=False))
    np.testing.assert_allclose(np.asarray(taps[5]), ref_post, atol=1e-4)


def test_efficientnetv2s_tap_parity():
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    bb = get_backbone("EfficientNetV2S")
    x = (np.random.default_rng(7).uniform(0, 255, (1, 64, 64, 3))
         ).astype(np.float32)
    variables, kmodel = load_backbone_weights("EfficientNetV2S", bb, x,
                                              weights=None)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["block1a_project_activation", "block2b_expand_activation",
             "block4a_expand_activation", "block6a_expand_activation",
             "top_activation"]
    kref = tf.keras.Model(kmodel.input,
                          [kmodel.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, name
        assert float(np.max(np.abs(got - ref))) < 1e-3, name


def test_mobilenetv3_full_parity():
    """MobileNetV3 Small/Large: full-network conversion exactness (the
    reference's tap names are broken under Keras 3 — see
    test_backbones.py::test_reference_mobilenetv3_taps_broken — so the
    fixture compares the complete include_top=False output)."""
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    x = np.random.default_rng(2).uniform(0, 255, (1, 96, 96, 3)).astype(
        np.float32)
    for name in ("MobileNetV3Small", "MobileNetV3Large"):
        bb = get_backbone(name)
        variables, kmodel = load_backbone_weights(name, bb, x, weights=None)
        taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
        ref = np.asarray(kmodel(x, training=False))
        got = np.asarray(taps[-1])
        assert got.shape == ref.shape, name
        rel = float(np.max(np.abs(got - ref))) / max(
            float(np.max(np.abs(ref))), 1e-9)
        assert rel < 1e-4, f"{name}: {rel}"


def test_inception_full_parity_valid_mode():
    """InceptionV3 / InceptionResNetV2: conversion exactness in pad='VALID'
    (keras-mirror) mode; the same weights drive the pad='SAME' intent mode
    whose taps land on the power-of-two grid (the reference's own taps are
    125/60/29/14 px at 256² and crash its decoder — see test_backbones.py)."""
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.inception import (
        InceptionResNetV2Backbone, InceptionV3Backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_backbone_weights)
    x = np.random.default_rng(3).uniform(-1, 1, (1, 160, 160, 3)).astype(
        np.float32)
    for name, cls in (("InceptionV3", InceptionV3Backbone),
                      ("InceptionResNetV2", InceptionResNetV2Backbone)):
        bb = cls(pad="VALID")
        variables, kmodel = load_backbone_weights(name, bb, x, weights=None)
        taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
        ref = np.asarray(kmodel(x, training=False))
        got = np.asarray(taps[-1])
        assert got.shape == ref.shape, name
        rel = float(np.max(np.abs(got - ref))) / max(
            float(np.max(np.abs(ref))), 1e-9)
        assert rel < 1e-4, f"{name}: {rel}"
        # intent mode: identical weights, power-of-two taps
        same = cls(pad="SAME")
        taps2 = same.apply(variables, np.zeros((1, 64, 64, 3), np.float32),
                           train=False)
        assert [t.shape[1] for t in taps2] == [64, 32, 16, 8, 4, 2]


def test_chexnet_h5_load_path(tmp_path):
    """Exercise the reference's CheXNet local-.h5 path
    (unet_variants.py:3439-3445) with a synthetically saved h5: build the
    same DenseNet121+Dense(14) topology, save weights, load through
    load_chexnet_weights, and check tap parity against the loaded base."""
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
        get_backbone)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones.pretrained import (
        load_chexnet_weights)
    # author a synthetic CheXNet_TF_Weights.h5 with the reference topology
    src = tf.keras.applications.DenseNet121(
        include_top=False, weights=None, input_shape=(64, 64, 3))
    pred = tf.keras.layers.Dense(14, activation="softmax",
                                 name="predictions")(src.output)
    full = tf.keras.Model(src.input, pred)
    h5 = str(tmp_path / "CheXNet_TF_Weights.weights.h5")
    full.save_weights(h5)

    bb = get_backbone("CheXNet")
    x = np.random.default_rng(4).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    variables, kbase = load_chexnet_weights(bb, x, weights=h5)
    taps = jax.jit(lambda v, x: bb.apply(v, x, train=False))(variables, x)
    names = ["conv1_relu", "pool2_relu", "pool3_relu", "pool4_relu", "relu"]
    kref = tf.keras.Model(kbase.input,
                          [kbase.get_layer(n).output for n in names])
    refs = [np.asarray(t) for t in kref(x, training=False)]
    for i, (name, ref) in enumerate(zip(names, refs), start=1):
        got = np.asarray(taps[i])
        assert got.shape == ref.shape, name
        assert float(np.max(np.abs(got - ref))) < 1e-4, name
    # and the loaded weights really are the h5's, not fresh inits
    w_src = src.get_layer("conv1_conv").get_weights()[0]
    w_loaded = kbase.get_layer("conv1_conv").get_weights()[0]
    np.testing.assert_array_equal(w_src, w_loaded)
