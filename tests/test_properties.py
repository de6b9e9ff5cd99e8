"""Property-based hardening (hypothesis) of core invariants:

- patchify -> unpatchify reconstructs the covered region exactly for any
  geometry/overlap (reference helper_functions.py:18-28 / Test.py:149-159)
- the DS label pyramid equals an independent block-max computation and
  preserves label values (helper_functions.py:359-380 semantics)
- segmentation losses are finite, non-negative, and zero at y_pred==y_true
- streaming metrics are batch-associative: many small updates == one big
  update (the invariant that makes them psum-mergeable across a mesh)
- one_hot/reverse round-trip; augmentation preserves mask label sets
- the native image loader stays bit-exact with PIL under random geometry
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tf_1d_2d_segmentation_end2endpipelines_tpu.data.patch import (
    create_patches, patch_grid, unpatchify)

SETTINGS = dict(max_examples=15, deadline=None)


@settings(**SETTINGS)
@given(h=st.integers(12, 60), w=st.integers(12, 60),
       patch=st.sampled_from([8, 12]),
       overlap=st.sampled_from([0.0, 0.25, 0.5]),
       chans=st.sampled_from([0, 1, 3]),
       seed=st.integers(0, 2**31 - 1))
def test_patch_roundtrip_exact_on_covered_region(h, w, patch, overlap,
                                                 chans, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if chans == 0 else (h, w, chans)
    img = rng.normal(size=shape).astype(np.float32)
    patches, n = create_patches(img, (patch, patch), overlap)
    assert patches.shape[0] == n
    rec = unpatchify(patches if chans else patches[..., None],
                     (h, w), overlap)
    if chans == 0:
        rec = rec if rec.ndim == 2 else rec[..., 0]
    ys, xs = patch_grid((h, w), patch, overlap)
    cov_h, cov_w = ys[-1] + patch, xs[-1] + patch
    np.testing.assert_array_equal(rec[:cov_h, :cov_w],
                                  img[:cov_h, :cov_w])
    # uncovered margins (windows that don't fit) reconstruct as zero
    assert not rec[cov_h:].any() and not rec[:, cov_w:].any()


@settings(**SETTINGS)
@given(depth=st.integers(1, 3), k=st.integers(1, 3),
       nclasses=st.sampled_from([1, 4]),
       seed=st.integers(0, 2**31 - 1))
def test_ds_pyramid_matches_block_max(depth, k, nclasses, seed):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.pyramid import \
        prepare_train_dict
    rng = np.random.default_rng(seed)
    size = (2 ** depth) * k
    mask = (rng.uniform(size=(2, size, size, nclasses)) > 0.6
            ).astype(np.float32)
    targets = prepare_train_dict(mask, depth, "UNet")
    np.testing.assert_array_equal(np.asarray(targets["out"]), mask)
    for i in range(1, depth + 1):
        f = 2 ** i
        want = mask.reshape(2, size // f, f, size // f, f,
                            nclasses).max(axis=(2, 4))
        got = np.asarray(targets[f"level{i}"])
        np.testing.assert_array_equal(got, want)
        assert set(np.unique(got)) <= set(np.unique(mask)) | {0.0}
    # UNetPP type: full-res targets at every level
    pp = prepare_train_dict(mask, depth, "UNetPP")
    for i in range(1, depth + 1):
        np.testing.assert_array_equal(np.asarray(pp[f"level{i}"]), mask)


@settings(**SETTINGS)
@given(name=st.sampled_from(["DiceLoss", "BCEDiceLoss", "IoULoss",
                             "FocalLoss", "BinaryCrossentropy",
                             "MeanSquaredError", "LogCosh", "Huber"]),
       seed=st.integers(0, 2**31 - 1))
def test_losses_finite_nonneg_and_zero_at_perfect(name, seed):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.losses import \
        get_loss
    import jax
    rng = np.random.default_rng(seed)
    y = (rng.uniform(size=(2, 16, 16, 1)) > 0.5).astype(np.float32)
    p = rng.uniform(1e-4, 1 - 1e-4, size=y.shape).astype(np.float32)
    fn = get_loss(name)
    val = float(fn(y, p))
    assert np.isfinite(val) and val >= 0.0, (name, val)
    # perfect predictions: (near-)zero loss.  IoULoss is exempt: the
    # reference's own formula (custom_losses.py:26-37) mixes a global
    # `total` with a per-element intersection, so it never reaches 0 —
    # replicated as a fidelity choice (see losses.iou_loss docstring)
    if name != "IoULoss":
        assert float(fn(y, y)) < 1e-3, name
    # gradients stay finite (the train step differentiates these)
    g = jax.grad(lambda q: fn(y, q).sum())(p)
    assert np.isfinite(np.asarray(g)).all(), name


@settings(**SETTINGS)
@given(name=st.sampled_from(["BinaryAccuracy", "BinaryIoU", "Precision",
                             "Recall", "AUC", "TruePositives"]),
       nbatch=st.integers(2, 4), seed=st.integers(0, 2**31 - 1))
def test_streaming_metrics_batch_associative(name, nbatch, seed):
    """k incremental updates == one update on the concatenation — the
    invariant that makes the states psum-mergeable across devices."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.metrics import \
        make_metric
    import jax
    rng = np.random.default_rng(seed)
    ys = [(rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
          for _ in range(nbatch)]
    ps = [rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
          for _ in range(nbatch)]
    m = make_metric(name)
    state = m.init()
    for y, p in zip(ys, ps):
        state = m.update(state, y, p)
    streamed = float(m.result(state))
    once = float(m.result(m.update(
        m.init(), np.concatenate(ys), np.concatenate(ps))))
    assert streamed == pytest.approx(once, abs=1e-5), name
    # and states merge additively (the psum contract)
    half1 = m.init()
    for y, p in zip(ys[:1], ps[:1]):
        half1 = m.update(half1, y, p)
    half2 = m.init()
    for y, p in zip(ys[1:], ps[1:]):
        half2 = m.update(half2, y, p)
    merged = jax.tree.map(lambda a, b: a + b, half1, half2)
    assert float(m.result(merged)) == pytest.approx(streamed, abs=1e-5)


@settings(**SETTINGS)
@given(nclasses=st.integers(2, 6), seed=st.integers(0, 2**31 - 1))
def test_one_hot_roundtrip(nclasses, seed):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.eval.segmetrics import (
        one_hot_encoding, reverse_one_hot_encoding)
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, nclasses, size=(3, 11, 7))
    oh = one_hot_encoding(labels, nclasses)
    assert oh.shape == (3, 11, 7, nclasses)
    np.testing.assert_array_equal(reverse_one_hot_encoding(oh), labels)


@settings(**SETTINGS)
@given(h=st.integers(16, 40), w=st.integers(16, 40),
       seed=st.integers(0, 2**31 - 1))
def test_augment_preserves_mask_label_set(h, w, seed):
    """Every geometric op resamples the mask with NEAREST, so augmented
    masks never invent label values (class indices survive exactly)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.generators import \
        augment_pair
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, size=(h, w, 3)).astype(np.float32)
    msk = rng.choice([0.0, 3.0, 7.0],
                     size=(h, w, 1)).astype(np.float32)
    _, a_msk = augment_pair(img, msk, np.random.default_rng(seed + 1))
    assert set(np.unique(a_msk)) <= {0.0, 3.0, 7.0}


@pytest.mark.skipif(
    __import__("tf_1d_2d_segmentation_end2endpipelines_tpu.native.imgio",
               fromlist=["get_lib"]).get_lib() is None,
    reason="native imgio unavailable")
@settings(max_examples=10, deadline=None)
@given(h=st.integers(8, 70), w=st.integers(8, 70),
       oh=st.integers(8, 70), ow=st.integers(8, 70),
       mode=st.sampled_from(["RGB", "L", "RGBA"]),
       cm=st.sampled_from(["rgb", "grayscale"]),
       res=st.sampled_from(["lanczos", "nearest"]),
       seed=st.integers(0, 2**31 - 1))
def test_native_imgio_matches_pil_random_geometry(tmp_path_factory, h, w,
                                                  oh, ow, mode, cm, res,
                                                  seed):
    from PIL import Image
    from tf_1d_2d_segmentation_end2endpipelines_tpu.native.imgio import \
        load_image_native
    rng = np.random.default_rng(seed)
    c = {"RGB": 3, "RGBA": 4, "L": 1}[mode]
    arr = rng.integers(0, 256, (h, w, c) if c > 1 else (h, w),
                       dtype=np.uint8)
    path = str(tmp_path_factory.mktemp("imgs") / "x.png")
    Image.fromarray(arr, mode).save(path)
    img = Image.open(path).convert("L" if cm == "grayscale" else "RGB")
    if img.size != (ow, oh):
        img = img.resize((ow, oh), Image.LANCZOS if res == "lanczos"
                         else Image.NEAREST)
    ref = np.asarray(img, np.float32)
    ref = ref[..., None] if ref.ndim == 2 else ref
    nat = load_image_native(path, (oh, ow), cm, res)
    assert nat is not None
    np.testing.assert_array_equal(nat, ref)


@settings(**SETTINGS)
@given(seed=st.integers(0, 2**31 - 1))
def test_train_config_ini_roundtrip_random(seed, tmp_path_factory):
    """Randomized INI round-trip: every TrainConfig field type (bool,
    int, float, str, tuple) survives save -> load exactly."""
    import dataclasses
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)
    rng = np.random.default_rng(seed)
    kwargs = {}
    for f in dataclasses.fields(TrainConfig):
        if f.type == "bool" or isinstance(f.default, bool):
            kwargs[f.name] = bool(rng.integers(0, 2))
        elif isinstance(f.default, int):
            kwargs[f.name] = int(rng.integers(1, 64))
        elif isinstance(f.default, float):
            kwargs[f.name] = float(np.round(rng.uniform(0.01, 2.0), 6))
        elif isinstance(f.default, tuple):
            kwargs[f.name] = tuple(
                rng.choice(["BinaryAccuracy", "AUC", "Precision"],
                           size=rng.integers(0, 3), replace=False))
    cfg = TrainConfig(**kwargs)
    path = str(tmp_path_factory.mktemp("ini") / "t.ini")
    save_train_config(cfg, path)
    back = load_train_config(path)
    for f in dataclasses.fields(TrainConfig):
        got, want = getattr(back, f.name), getattr(cfg, f.name)
        if isinstance(want, float):
            assert got == pytest.approx(want, rel=1e-9), f.name
        elif isinstance(want, tuple):
            assert tuple(got) == tuple(want), f.name
        else:
            assert got == want, f.name
