"""Augmentation pipeline tests: pair-consistent transforms, non-square
safety, the offline `tpuseg augment` stage (reference augment,
helper_functions.py:480-501), and on-the-fly loader augmentation."""
import os

import numpy as np
from PIL import Image

from tf_1d_2d_segmentation_end2endpipelines_tpu.data.generators import (
    PrefetchLoader, SegmentationFolderDataset, augment_dataset,
    augment_pair, _warp_pair)


def test_warp_pair_image_mask_consistency():
    """The SAME affine hits image and mask: a mask that traces the image
    must still trace it after the warp (up to interpolation at edges)."""
    rng = np.random.default_rng(0)
    img = np.zeros((40, 40, 1), np.float32)
    img[10:30, 14:26] = 1.0
    msk = img.copy()
    w_img, w_msk = _warp_pair(img, msk, angle=17.0, scale=1.05,
                              tx=0.03, ty=-0.02)
    assert w_img.shape == img.shape and w_msk.shape == msk.shape
    # nearest-warped mask stays binary
    assert set(np.unique(w_msk)) <= {0.0, 1.0}
    # and overlaps the bilinear-warped image region almost perfectly
    inter = np.sum((w_img > 0.5) & (w_msk > 0.5))
    union = np.sum((w_img > 0.5) | (w_msk > 0.5))
    assert inter / union > 0.9
    del rng


def test_augment_pair_nonsquare_and_label_preservation():
    """Non-square inputs never crash; nearest-resampled masks keep their
    ordinal label values exactly; same seed -> same output."""
    rng_img = np.random.default_rng(3)
    img = rng_img.uniform(0, 1, (48, 32, 3)).astype(np.float32)
    msk = np.zeros((48, 32, 1), np.float32)
    msk[8:20, 8:20] = 1.0
    msk[12:16, 12:16] = 2.0
    for seed in range(8):  # sweep seeds so every op branch fires
        a_img, a_msk = augment_pair(img, msk,
                                    np.random.default_rng(seed))
        assert a_img.shape == img.shape and a_msk.shape == msk.shape
        assert set(np.unique(a_msk)) <= {0.0, 1.0, 2.0}, seed
    one = augment_pair(img, msk, np.random.default_rng(5))
    two = augment_pair(img, msk, np.random.default_rng(5))
    assert np.array_equal(one[0], two[0])
    assert np.array_equal(one[1], two[1])


def test_augment_pair_geometric_consistency():
    """Feed the mask AS the image: every geometric op must hit both
    identically (photometric jitter applies to the image only, so compare
    support masks, not values)."""
    msk = np.zeros((32, 32, 1), np.float32)
    msk[4:20, 10:26] = 1.0
    for seed in range(8):
        a_img, a_msk = augment_pair(msk.copy(), msk.copy(),
                                    np.random.default_rng(seed))
        # bilinear (image) vs nearest (mask) resampling may disagree on
        # single boundary pixels; interiors must coincide
        ai, am = a_img > 0.5, a_msk > 0.5
        iou = np.sum(ai & am) / max(np.sum(ai | am), 1)
        assert iou > 0.93, (seed, iou)


def _write_pairs(root, n=2, size=(32, 32)):
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.uniform(0, 255, (*size, 3)).astype(np.uint8)
        msk = np.zeros(size, np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"{i}.png"))
        Image.fromarray(msk).save(os.path.join(root, "masks", f"{i}.png"))


def test_augment_dataset_offline(tmp_path):
    """Offline stage writes N copies per pair with the reference's
    _Augmented_{i} naming, masks stay binary, re-runs don't compound,
    and the folder still loads as a paired dataset."""
    root = str(tmp_path / "Train")
    _write_pairs(root, n=2)
    written = augment_dataset(os.path.join(root, "images"),
                              os.path.join(root, "masks"), 3, seed=1)
    assert len(written) == 6  # 2 images x 3 copies
    assert all("_Augmented_" in os.path.basename(p) for p in written)
    msk_aug = np.asarray(Image.open(os.path.join(
        root, "masks", "0_Augmented_1.png")))
    assert set(np.unique(msk_aug)) <= {0, 255}
    # re-run: augmented files are not re-augmented as sources
    augment_dataset(os.path.join(root, "images"),
                    os.path.join(root, "masks"), 1, seed=2)
    names = os.listdir(os.path.join(root, "images"))
    assert not any(n.count("_Augmented_") > 1 for n in names)
    ds = SegmentationFolderDataset(root, (32, 32))
    # originals + first run (the second run overwrote _Augmented_1 —
    # reference naming is deterministic, helper_functions.py:501)
    assert len(ds) == 2 + 6
    img, msk = ds.load_pair(2)
    assert img.shape == (32, 32, 3) and msk.shape == (32, 32, 1)


def test_augment_cli(tmp_path):
    """`tpuseg augment --data <root>` iterates fold_i/{images,masks}."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import main
    for fold in (1, 2):
        _write_pairs(str(tmp_path / "Train" / f"fold_{fold}"), n=2)
    main(["augment", "--data", str(tmp_path / "Train"), "--num", "2"])
    for fold in (1, 2):
        d = tmp_path / "Train" / f"fold_{fold}" / "images"
        assert len(list(d.iterdir())) == 2 + 4


def test_prefetch_loader_on_the_fly_augment(tmp_path):
    """augment=True: epochs differ, reruns reproduce, shapes unchanged."""
    root = str(tmp_path / "Train")
    _write_pairs(root, n=4)
    ds = SegmentationFolderDataset(root, (32, 32))

    def epoch_batches(loader):
        return [(x.copy(), y.copy()) for x, y in loader()]

    loader = PrefetchLoader(ds, 2, shuffle=False, seed=7, augment=True)
    e1 = epoch_batches(loader)
    e2 = epoch_batches(loader)
    assert e1[0][0].shape == (2, 32, 32, 3)
    assert e1[0][1].shape == (2, 32, 32, 1)
    assert not all(np.array_equal(a[0], b[0]) for a, b in zip(e1, e2))
    loader_again = PrefetchLoader(ds, 2, shuffle=False, seed=7,
                                  augment=True)
    r1 = epoch_batches(loader_again)
    assert all(np.array_equal(a[0], b[0]) for a, b in zip(e1, r1))
    # masks stay valid labels after augmentation
    assert all(set(np.unique(y)) <= {0.0, 1.0} for _, y in e1)


def test_prefetch_loader_zero_batch_guard(tmp_path):
    """drop_remainder + dataset smaller than batch_size must raise, not
    silently train zero steps (ADVICE r2)."""
    import pytest
    root = str(tmp_path / "Train")
    _write_pairs(root, n=2)
    ds = SegmentationFolderDataset(root, (32, 32))
    loader = PrefetchLoader(ds, 4, drop_remainder=True)
    with pytest.raises(ValueError, match="no batches"):
        next(loader())


def test_prefetch_loader_cache(tmp_path):
    """cache=True: identical batches to the uncached loader, but each
    file decodes exactly once across epochs (get_datasets-style bulk
    residency, helper_functions.py:231-260, without the up-front stall);
    per-epoch augmentation still varies on top of the cached decode."""
    root = str(tmp_path / "Train")
    _write_pairs(root, n=4)
    ds = SegmentationFolderDataset(root, (32, 32))
    calls = {"n": 0}
    orig = ds.load_pair

    def counting(idx):
        calls["n"] += 1
        return orig(idx)

    ds.load_pair = counting

    def epochs(loader, k=3):
        return [[(x.copy(), y.copy()) for x, y in loader()]
                for _ in range(k)]

    cached = PrefetchLoader(ds, 2, shuffle=True, seed=5, cache=True)
    got = epochs(cached)
    assert calls["n"] == 4  # one decode per image, not per epoch
    plain = PrefetchLoader(ds, 2, shuffle=True, seed=5)
    want = epochs(plain)
    for e_got, e_want in zip(got, want):
        for (xg, yg), (xw, yw) in zip(e_got, e_want):
            np.testing.assert_array_equal(xg, xw)
            np.testing.assert_array_equal(yg, yw)
    # augment on top of cache: epochs differ, and the cached source
    # array is not corrupted by the augmentation views
    aug = PrefetchLoader(ds, 2, shuffle=False, seed=5, cache=True,
                         augment=True)
    a1 = epochs(aug, 2)
    assert not all(np.array_equal(a[0], b[0])
                   for a, b in zip(a1[0], a1[1]))
    base1 = [x for x, _ in epochs(PrefetchLoader(
        ds, 2, shuffle=False, seed=5, cache=True), 1)[0]]
    base2 = [x for x, _ in epochs(PrefetchLoader(
        ds, 2, shuffle=False, seed=5), 1)[0]]
    for a, b in zip(base1, base2):
        np.testing.assert_array_equal(a, b)


def test_device_augment_properties():
    """The jitted device pipeline: deterministic per key, different per
    key, geometric ops hit image and mask identically, mask label values
    survive (order-0 resampling), non-square inputs work (rot90 gated)."""
    import jax
    import jax.numpy as jnp
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.device_augment \
        import augment_stream_key, make_device_augment

    rng = np.random.default_rng(0)
    aug = make_device_augment()
    img = rng.uniform(0, 1, (4, 24, 24, 3)).astype(np.float32)
    msk = rng.choice([0.0, 1.0], size=(4, 24, 24, 1)).astype(np.float32)
    k1 = augment_stream_key(7, 0, 0)
    a_img, a_msk = aug(k1, img, msk)
    b_img, b_msk = aug(k1, img, msk)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_msk), np.asarray(b_msk))
    c_img, _ = aug(augment_stream_key(7, 0, 1), img, msk)
    assert not np.array_equal(np.asarray(a_img), np.asarray(c_img))
    # label preservation: order-0 mask resampling invents no values
    assert set(np.unique(np.asarray(a_msk))) <= {0.0, 1.0}
    # intensities stay in the configured range
    assert float(jnp.min(a_img)) >= 0.0 and float(jnp.max(a_img)) <= 1.0

    # geometric consistency: feed the mask as the image too — after
    # augmentation the (bilinear) image and (nearest) mask agree except
    # on interpolation-boundary pixels
    m3 = np.repeat(msk, 3, axis=-1)
    g_img, g_msk = aug(augment_stream_key(3, 1, 2), m3, msk)
    gi = np.asarray(g_img[..., :1]) > 0.5
    gm = np.asarray(g_msk) > 0.5
    iou = (gi & gm).sum() / max((gi | gm).sum(), 1)
    # bilinear (image) vs 3x-nearest (mask) shear rounding disagrees on
    # boundary pixels of this 24x24 random mask; interiors coincide
    assert iou > 0.9, iou

    # non-square: rot90 is gated off, everything else runs
    nimg = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    nmsk = rng.choice([0.0, 1.0], size=(2, 16, 24, 1)).astype(np.float32)
    o_img, o_msk = aug(augment_stream_key(1, 0, 0), nimg, nmsk)
    assert o_img.shape == nimg.shape and o_msk.shape == nmsk.shape
    assert set(np.unique(np.asarray(o_msk))) <= {0.0, 1.0}


def test_device_augment_driver(tmp_path):
    """INI `augment_device = 1` trains through the 2D driver (DS pyramid
    built from the AUGMENTED mask) and reruns reproduce exactly."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import \
        train as run_train
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)
    root = str(tmp_path / "Train")
    _write_pairs(root, n=4)
    cfg = TrainConfig(
        train_dir=root, imlength=32, imwidth=32, model_width=4,
        model_depth=2, decoder_name="UNet", model_genre="UNet",
        batch_size=2, num_epochs=2, learning_rate=1e-3,
        loss_function="BCEDiceLoss", metric_list=(),
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        start_fold=1, end_fold=1, save_history=False, load_weights=False,
        independent_val_set=False, validation_portion=0.0,
        augment_device=True)
    ini = str(tmp_path / "t.ini")
    save_train_config(cfg, ini)
    assert load_train_config(ini).augment_device is True
    h1 = run_train(config=cfg)
    import shutil
    shutil.rmtree(str(tmp_path / "R"))
    h2 = run_train(config=cfg)
    assert h1[1]["loss"] == h2[1]["loss"]
    # augmentation actually perturbs training: a non-augmented run on the
    # same data diverges
    cfg_plain = load_train_config(ini)
    cfg_plain.augment_device = False
    cfg_plain.save_dir = str(tmp_path / "P")
    h3 = run_train(config=cfg_plain)
    assert h1[1]["loss"] != h3[1]["loss"]


def test_fast_warp_matches_gather_reference():
    """The TPU-first warp (3 Paeth shears + per-axis matmuls) reproduces
    the gather-based map_coordinates warp's geometry: smooth-image MAE
    < 0.01 in the interior, mask IoU > 0.9, label values exact."""
    import jax.numpy as jnp
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.device_augment \
        import _warp, _warp_fast

    g = np.linspace(0, 1, 48)
    img = (np.outer(np.sin(g * 6), np.cos(g * 5)) * 0.5 + 0.5
           )[..., None].astype(np.float32)
    msk = (img > 0.5).astype(np.float32)
    for angle, scale, tx, ty in [(20.0, 1.0, 0.0, 0.0),
                                 (-28.0, 1.05, 0.03, -0.02),
                                 (0.0, 0.9, 0.05, -0.06)]:
        ref = np.asarray(_warp(jnp.asarray(img), angle, scale, tx, ty, 1))
        fast = np.asarray(_warp_fast(jnp.asarray(img), angle, scale,
                                     tx, ty, 1, 16))
        c = 8
        assert np.abs(ref - fast)[c:-c, c:-c].mean() < 0.01, (angle, scale)
        refm = np.asarray(_warp(jnp.asarray(msk), angle, scale, tx, ty, 0))
        fastm = np.asarray(_warp_fast(jnp.asarray(msk), angle, scale,
                                      tx, ty, 0, 16))
        a, b = refm[c:-c, c:-c] > .5, fastm[c:-c, c:-c] > .5
        assert (a & b).sum() / max((a | b).sum(), 1) > 0.9
        assert set(np.unique(fastm)) <= {0.0, 1.0}


def test_device_augment_warp_modes():
    """batch mode shares warp params across the batch per step (params
    still differ ACROSS steps); sample mode varies them within a batch;
    both are deterministic per key."""
    import jax.numpy as jnp
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.device_augment \
        import augment_stream_key, make_device_augment

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (6, 20, 20, 1)).astype(np.float32)
    msk = rng.choice([0.0, 1.0], size=(6, 20, 20, 1)).astype(np.float32)
    for mode in ("batch", "sample"):
        aug = make_device_augment(p_flip=0.0, p_warp=1.0, p_jitter=0.0,
                                  warp_mode=mode)
        k = augment_stream_key(5, 0, 0)
        a1, m1 = aug(k, img, msk)
        a2, _ = aug(k, img, msk)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        b1, _ = aug(augment_stream_key(5, 0, 1), img, msk)
        assert not np.array_equal(np.asarray(a1), np.asarray(b1))
        assert set(np.unique(np.asarray(m1))) <= {0.0, 1.0}
    # identical NON-SQUARE inputs across the batch (rot90 is square-only,
    # so the warp is the only per-sample geometric degree of freedom):
    # batch mode warps them all the same way; sample mode does not
    rng2 = np.random.default_rng(2)
    img = rng2.uniform(0, 1, (1, 20, 24, 1)).astype(np.float32)
    msk = rng2.choice([0.0, 1.0], size=(1, 20, 24, 1)).astype(np.float32)
    same = np.repeat(img, 6, axis=0)
    samem = np.repeat(msk, 6, axis=0)
    k = augment_stream_key(9, 0, 0)
    ab, _ = make_device_augment(p_flip=0.0, p_warp=1.0, p_jitter=0.0,
                                warp_mode="batch")(k, same, samem)
    ab = np.asarray(ab)
    assert all(np.array_equal(ab[0], ab[i]) for i in range(6))
    asamp, _ = make_device_augment(p_flip=0.0, p_warp=1.0, p_jitter=0.0,
                                   warp_mode="sample")(k, same, samem)
    asamp = np.asarray(asamp)
    assert not all(np.array_equal(asamp[0], asamp[i]) for i in range(6))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_device_augment(warp_mode="nope")


def test_device_augment_driver_guards(tmp_path):
    """patchify + augment_device is rejected loudly (the host path
    augments whole images BEFORE patching), and value_range follows the
    image normalization (raw 0-255 inputs keep their range)."""
    import pytest
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import \
        train as run_train
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
        TrainConfig
    root = str(tmp_path / "Train")
    _write_pairs(root, n=2)
    cfg = TrainConfig(
        train_dir=root, imlength=32, imwidth=32, model_width=4,
        model_depth=2, decoder_name="UNet", model_genre="UNet",
        batch_size=2, num_epochs=1, learning_rate=1e-3,
        loss_function="MeanSquaredError", metric_list=(),
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        start_fold=1, end_fold=1, save_history=False, load_weights=False,
        independent_val_set=False, validation_portion=0.0,
        augment_device=True, patchify=True, patch_width=16,
        patch_height=16)
    with pytest.raises(ValueError, match="augment_device.*patchify"):
        run_train(config=cfg)
    # invalid combos fail BEFORE artifacts are written
    assert not os.path.exists(str(tmp_path / "R"))

    cfg.patchify = False
    cfg.augment = True  # host + device double-augmentation: also loud
    with pytest.raises(ValueError, match="ALTERNATIVES"):
        run_train(config=cfg)
    assert not os.path.exists(str(tmp_path / "R"))

    # raw-range images (normalizing_factor_img=1): the jitter clip must
    # NOT crush values to [0,1]
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data.device_augment \
        import augment_stream_key, make_device_augment
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (4, 16, 24, 3)).astype(np.float32)
    msk = rng.choice([0.0, 255.0], size=(4, 16, 24, 1)).astype(np.float32)
    aug = make_device_augment(p_flip=0.0, p_warp=0.0, p_jitter=1.0,
                              value_range=255.0)
    a, m = aug(augment_stream_key(1, 0, 0), img, msk)
    assert float(np.asarray(a).max()) > 2.0  # not clipped to [0,1]
    assert set(np.unique(np.asarray(m))) <= {0.0, 255.0}
