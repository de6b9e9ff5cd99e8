"""File-based input pipeline (replaces reference ``CustomDataGenerator``,
utils/DataGenerator.py:7-114, and the bulk loader ``get_datasets``,
helper_functions.py:231-260).

Differences from the reference (TPU-first):
- batches are materialized as contiguous numpy arrays and handed to
  ``parallel.shard_batch`` for a single host->HBM transfer, instead of
  per-image PIL decode inside the training step's critical path
- decode/resize runs in a background thread pool, double-buffered, so the
  accelerator never waits on PIL (the reference's loader is synchronous)
- the deep-supervision label pyramid is built on-device
  (``data.prepare_train_dict``) rather than per-batch in Python
"""
from __future__ import annotations

import concurrent.futures as cf
import os
import typing as tp

import numpy as np

from .patch import create_patches


def _list_images(directory: str) -> tp.List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
    return sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.lower().endswith(exts))


def load_image(path: str, size: tp.Tuple[int, int], color_mode: str,
               resample: str = "lanczos", norm: float = 1.0) -> np.ndarray:
    """Load + convert + resize (lanczos for images, nearest for masks --
    the reference's choices, DataGenerator.py:68-77) + divide by ``norm``.

    Decodes through the native C path (native/imgio.cpp: libpng/libjpeg
    decode + PIL-exact convert/resize fused with the float32
    normalization) when available -- bit-identical to the PIL fallback
    (tests/test_native_io.py), so numerics don't depend on the toolchain.
    ``TPUSEG_NATIVE_IO=0`` forces PIL."""
    from ..native.imgio import load_image_native
    arr = load_image_native(path, size, color_mode, resample, norm)
    if arr is not None:
        return arr
    from PIL import Image
    img = Image.open(path)
    img = img.convert("L" if color_mode == "grayscale" else "RGB")
    if img.size != (size[1], size[0]):
        method = Image.LANCZOS if resample == "lanczos" else Image.NEAREST
        img = img.resize((size[1], size[0]), method)
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr if norm == 1.0 else arr / np.float32(norm)


class SegmentationFolderDataset:
    """Paired image/mask folder dataset with the reference's layout
    (``{dir}/images``, ``{dir}/masks`` or flat dirs ``img``/``msk``)."""

    def __init__(self, directory: str, image_size: tp.Tuple[int, int],
                 image_color_mode: str = "rgb",
                 mask_color_mode: str = "grayscale",
                 normalizing_factor_img: float = 255.0,
                 normalizing_factor_msk: float = 255.0):
        cands = [(os.path.join(directory, "images"),
                  os.path.join(directory, "masks")),
                 (os.path.join(directory, "img"),
                  os.path.join(directory, "msk"))]
        for img_dir, msk_dir in cands:
            if os.path.isdir(img_dir) and os.path.isdir(msk_dir):
                break
        else:
            raise FileNotFoundError(
                f"no images/masks (or img/msk) subdirs under {directory}")
        self.image_paths = _list_images(img_dir)
        self.mask_paths = _list_images(msk_dir)
        assert len(self.image_paths) == len(self.mask_paths), (
            "image/mask count mismatch")  # DataGenerator.py:31
        self.image_size = image_size
        self.image_color_mode = image_color_mode
        self.mask_color_mode = mask_color_mode
        self.nf_img = normalizing_factor_img
        self.nf_msk = normalizing_factor_msk

    def __len__(self) -> int:
        return len(self.image_paths)

    def load_pair(self, idx: int) -> tp.Tuple[np.ndarray, np.ndarray]:
        img = load_image(self.image_paths[idx], self.image_size,
                         self.image_color_mode, "lanczos", self.nf_img)
        msk = load_image(self.mask_paths[idx], self.image_size,
                         self.mask_color_mode, "nearest", self.nf_msk)
        return img, msk


class SubsetDataset:
    """Index-subset view of a SegmentationFolderDataset (used for the
    validation_portion split, reference Train.py:281-315 when no
    independent validation set is configured)."""

    def __init__(self, base: "SegmentationFolderDataset",
                 indices: tp.Sequence[int]):
        self.base = base
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def load_pair(self, idx: int):
        return self.base.load_pair(self.indices[idx])


def split_dataset(ds: "SegmentationFolderDataset", val_portion: float,
                  seed: int = 1):
    """Random train/val split by portion."""
    n = len(ds)
    order = np.random.default_rng(seed).permutation(n)
    n_val = int(n * val_portion)
    return (SubsetDataset(ds, order[n_val:]),
            SubsetDataset(ds, order[:n_val]))


class PrefetchLoader:
    """Threaded batch loader with per-image fan-out.

    ``__call__`` returns a fresh epoch iterator (the Trainer's BatchIter
    contract).  Every image decode is its own pool task (PIL releases the
    GIL inside its decoders, so the ``num_workers`` threads genuinely
    overlap), and a sliding window of ``prefetch_batches`` batches' worth
    of decodes stays in flight ahead of the consumer — so the NEXT batches
    decode while the device computes on the current one.
    """

    def __init__(self, dataset: SegmentationFolderDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 1,
                 patchify: bool = False,
                 patch_shape: tp.Tuple[int, int] = (64, 64),
                 overlap_ratio: float = 0.0,
                 num_workers: int = 4,
                 prefetch_batches: int = 2,
                 drop_remainder: bool = False,
                 augment: bool = False,
                 cache: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.patchify = patchify
        self.patch_shape = patch_shape
        self.overlap_ratio = overlap_ratio
        self.num_workers = num_workers
        self.prefetch_batches = max(prefetch_batches, 1)
        self.drop_remainder = drop_remainder
        # on-the-fly augmentation (augment_pair per decoded example,
        # applied before patchify so patches stay self-consistent); the
        # rng is seeded per (seed, epoch, index) so epochs differ but
        # runs reproduce
        self.augment = augment
        # decode cache: epoch 2+ serve the decoded (img, msk) pairs from
        # RAM instead of re-decoding files (the reference re-decodes every
        # epoch, DataGenerator.py:68-77).  Augmentation/patchify still run
        # per-epoch on the cached decode, so epochs differ as usual
        self.cache = cache
        self._cached: tp.Dict[int, tp.Tuple[np.ndarray, np.ndarray]] = {}
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Fast-forward the epoch counter (exact resume): the shuffle and
        augmentation rngs are (seed, epoch)-keyed, so a resumed run
        replays exactly the data order the uninterrupted run would have
        produced from this epoch on."""
        self._epoch = int(epoch)

    def _load_one(self, i: int) -> tp.Tuple[np.ndarray, np.ndarray]:
        if self.cache and int(i) in self._cached:
            img, msk = self._cached[int(i)]
        else:
            img, msk = self.ds.load_pair(int(i))
            if self.cache:
                # dict writes are atomic under the GIL; worst case two
                # pool threads both decode and one wins — still correct
                self._cached[int(i)] = (img, msk)
        if self.augment:
            rng = np.random.default_rng((self.seed, self._epoch, int(i)))
            img, msk = augment_pair(img, msk, rng)
        if self.patchify:
            ip, _ = create_patches(img, self.patch_shape,
                                   self.overlap_ratio)
            mp, _ = create_patches(msk, self.patch_shape,
                                   self.overlap_ratio)
            return ip, mp
        return img[None], msk[None]

    def __call__(self):
        n = len(self.ds)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        self._epoch += 1
        stop = n - (n % self.batch_size) if self.drop_remainder else n
        batches = [idx[s:s + self.batch_size]
                   for s in range(0, stop, self.batch_size)]
        if not batches:
            # an epoch of zero batches would silently train nothing
            # (no loss in history, nothing checkpointed) — fail loudly
            raise ValueError(
                f"PrefetchLoader yields no batches: dataset has {n} "
                f"example(s) and batch_size={self.batch_size}"
                + (" with drop_remainder=True (accumulation requires "
                   "full batches); shrink batch_size or add data"
                   if self.drop_remainder and n else ""))
        flat = [int(i) for b in batches for i in b]
        window = self.batch_size * self.prefetch_batches
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures: tp.Dict[int, cf.Future] = {
                j: pool.submit(self._load_one, flat[j])
                for j in range(min(window, len(flat)))}
            pos = 0
            for b in batches:
                parts = []
                for _ in b:
                    parts.append(futures.pop(pos).result())
                    nxt = pos + window
                    if nxt < len(flat):
                        futures[nxt] = pool.submit(self._load_one,
                                                   flat[nxt])
                    pos += 1
                yield (np.concatenate([p[0] for p in parts], 0),
                       np.concatenate([p[1] for p in parts], 0))


def create_folds(image_dir: str, mask_dir: str, out_dir: str,
                 num_folds: int = 5, test_portion: float = 0.2,
                 val_portion: float = 0.1, seed: int = 1) -> None:
    """Random train/test/val split into ``Data/{Train,Test,Val}/fold_i``
    (reference ``create_folds``, helper_functions.py:443-477)."""
    import shutil
    imgs = _list_images(image_dir)
    msks = _list_images(mask_dir)
    assert len(imgs) == len(msks)
    rng = np.random.default_rng(seed)
    for fold in range(1, num_folds + 1):
        order = rng.permutation(len(imgs))
        n_test = int(len(imgs) * test_portion)
        n_val = int(len(imgs) * val_portion)
        splits = {
            "Test": order[:n_test],
            "Val": order[n_test:n_test + n_val],
            "Train": order[n_test + n_val:],
        }
        for split, sel in splits.items():
            for sub, paths in (("images", imgs), ("masks", msks)):
                dst = os.path.join(out_dir, split, f"fold_{fold}", sub)
                os.makedirs(dst, exist_ok=True)
                for i in sel:
                    shutil.copy2(paths[i], dst)


def _warp_pair(img: np.ndarray, msk: np.ndarray, angle: float,
               scale: float, tx: float, ty: float
               ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Apply ONE affine (rotate about the center + scale + shift) to both
    tensors: bilinear for the image, nearest for the mask so label values
    survive exactly.  Non-square safe (cv2 warp keeps the input canvas)."""
    import cv2
    h, w = img.shape[:2]
    mat = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, scale)
    mat[0, 2] += tx * w
    mat[1, 2] += ty * h
    kw = dict(dsize=(w, h), borderMode=cv2.BORDER_REFLECT_101)
    img_w = cv2.warpAffine(img, mat, flags=cv2.INTER_LINEAR, **kw)
    msk_w = cv2.warpAffine(msk, mat, flags=cv2.INTER_NEAREST, **kw)
    # cv2 drops singleton channel axes
    if img_w.ndim == 2:
        img_w = img_w[..., None]
    if msk_w.ndim == 2:
        msk_w = msk_w[..., None]
    return img_w, msk_w


def augment_pair(img: np.ndarray, msk: np.ndarray, rng: np.random.Generator
                 ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Geometric + photometric augmentation of one image/mask pair
    (capability parity with the reference's albumentations pipeline,
    helper_functions.py:480-501; albumentations is not in this image, so
    cv2/numpy equivalents with albumentations-default ranges).

    Ops: H/V flips, rot90 (square inputs), shift-scale-rotate (non-square
    safe; ±30 deg, scale 0.9-1.1, shift ±6.25% — ShiftScaleRotate
    defaults), brightness/contrast jitter (image only).  Every geometric
    op hits image and mask identically; the mask is warped with nearest
    interpolation so label values are preserved exactly."""
    if rng.random() < 0.5:
        img, msk = img[:, ::-1], msk[:, ::-1]
    if rng.random() < 0.5:
        img, msk = img[::-1], msk[::-1]
    k = int(rng.integers(0, 4))
    if k and img.shape[0] == img.shape[1]:
        img, msk = np.rot90(img, k), np.rot90(msk, k)
    if rng.random() < 0.5:
        img, msk = _warp_pair(
            np.ascontiguousarray(img, np.float32),
            np.ascontiguousarray(msk, np.float32),
            angle=float(rng.uniform(-30.0, 30.0)),
            scale=float(rng.uniform(0.9, 1.1)),
            tx=float(rng.uniform(-0.0625, 0.0625)),
            ty=float(rng.uniform(-0.0625, 0.0625)))
    if rng.random() < 0.3:
        hi = 255.0 if img.max() > 1.0 else 1.0  # raw-uint8 or normalized
        img = np.clip(img * rng.uniform(0.8, 1.2)
                      + rng.uniform(-0.05, 0.05) * hi, 0.0, hi)
    return (np.ascontiguousarray(img, np.float32),
            np.ascontiguousarray(msk, np.float32))


def augment_dataset(image_dir: str, mask_dir: str, num_copies: int,
                    seed: int = 1) -> tp.List[str]:
    """Offline augmentation: write ``num_copies`` augmented copies of
    every image/mask pair back into the SAME folders, suffixed
    ``_Augmented_{i}`` (the reference's pre-training stage:
    helper_functions.py:480-501 writes ``{name}_Augmented_{iv}.png``
    in place; the 2D notebook runs it before every training run).
    Masks get the identical geometric transform (nearest-resampled).
    Already-augmented files are skipped as sources so re-runs don't
    compound.  Returns the written image paths."""
    from PIL import Image

    imgs = [p for p in _list_images(image_dir)
            if "_Augmented_" not in os.path.basename(p)]
    msks = [p for p in _list_images(mask_dir)
            if "_Augmented_" not in os.path.basename(p)]
    assert len(imgs) == len(msks), "image/mask count mismatch"
    rng = np.random.default_rng(seed)
    written = []
    for img_path, msk_path in zip(imgs, msks):
        img = np.asarray(Image.open(img_path), np.float32)
        msk = np.asarray(Image.open(msk_path), np.float32)
        for i in range(1, num_copies + 1):
            a_img, a_msk = augment_pair(img, msk, rng)
            for src, arr in ((img_path, a_img), (msk_path, a_msk)):
                stem, _ = os.path.splitext(os.path.basename(src))
                dst = os.path.join(os.path.dirname(src),
                                   f"{stem}_Augmented_{i}.png")
                out = np.clip(np.round(arr), 0, 255).astype(np.uint8)
                Image.fromarray(out.squeeze(-1) if out.ndim == 3
                                and out.shape[-1] == 1 else out).save(dst)
                if src is img_path:
                    written.append(dst)
    return written
