"""Device-compiled training augmentation (the TPU-native counterpart of
the host pipeline ``augment_pair``, data/generators.py — same op set:
H/V flips, rot90 on square inputs, shift-scale-rotate, brightness/
contrast jitter; reference semantics: albumentations defaults,
helper_functions.py:480-501).

One ``jax.jit``-compiled program augments the WHOLE batch on device:
per-sample randomness via split keys + ``vmap``, geometric ops applied
identically to image and mask (mask resampled order-0 so label values
survive exactly, image order-1 with reflect-101 borders), static shapes
throughout.  Enabled with INI ``augment_device = 1`` — keyed by
(seed, epoch, step) so runs reproduce and exact resume replays the same
augmentation stream.

The warp is where TPU-first design matters.  A general affine resample
is GATHER-bound (``map_coordinates`` does 4 gathers/pixel; TPU lowers
general gathers slowly): ~620 ms per 128x256x256 batch — more than the
b128 train step.  ``_warp_fast`` rebuilds the same geometry from ops the
hardware likes: rotation as three Paeth shears (per-row fractional
shifts = two batched CONTIGUOUS dynamic-slices + a blend), then uniform
scale+translate as two per-axis interpolation MATMULS on the MXU.
Measured (v5e, b128 256x256x3, full op set):

- ``warp_mode="batch"`` + fast warp (default): **~40 ms/batch** — the
  per-row slice starts are shared across the batch, the pattern XLA
  lowers efficiently
- ``warp_mode="sample"`` + fast warp: ~306 ms (per-sample slice starts
  are latency-bound)
- ``warp_mode="sample"`` + gather warp (``fast_warp=False``): ~622 ms
- warp disabled (``p_warp=0``): ~26 ms

Geometric agreement of the fast warp with the gather reference: image
MAE < 0.002, mask IoU > 0.95, label values exact
(tests/test_augment.py).
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


def _warp(x: jax.Array, angle_deg: jax.Array, scale: jax.Array,
          tx: jax.Array, ty: jax.Array, order: int) -> jax.Array:
    """Inverse-mapped affine (rotate about center + scale + shift as
    fractions of the canvas) on one (H, W, C) tensor; 'mirror' mode is
    scipy/cv2 reflect-101."""
    h, w = x.shape[0], x.shape[1]
    theta = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # destination pixel -> source position: undo shift, then the inverse
    # rotation/scale about the center
    dy = yy - cy - ty * h
    dx = xx - cx - tx * w
    src_y = (cos * dy - sin * dx) / scale + cy
    src_x = (sin * dy + cos * dx) / scale + cx
    return jax.vmap(
        lambda ch: map_coordinates(ch, [src_y, src_x], order=order,
                                   mode="mirror"),
        in_axes=2, out_axes=2)(x)


def _mirror_coords(src: jax.Array, size: int) -> jax.Array:
    """Reflect-101 out-of-range source coordinates back into [0, size-1]
    (period 2*(size-1)), so downstream interpolation never clamps."""
    period = 2.0 * (size - 1)
    src = jnp.abs(src) % period
    return jnp.minimum(src, period - src)


def _axis_resample_matrix(src: jax.Array, size: int, order: int
                          ) -> jax.Array:
    """(out, in) interpolation matrix for 1D source coordinates ``src``
    (out,): order-1 rows hold the two bilinear taps, order-0 a one-hot
    nearest tap.  Dense (out, in) so the resample runs as ONE matmul on
    the MXU instead of per-pixel gathers (TPU lowers general gathers an
    order of magnitude slower — see the module docstring measurements)."""
    if size == 1:
        return jnp.ones((src.shape[0], 1), jnp.float32)
    src = _mirror_coords(src, size)
    if order == 0:
        return jax.nn.one_hot(jnp.round(src).astype(jnp.int32), size)
    grid = jnp.arange(size, dtype=jnp.float32)[None, :]
    return jnp.maximum(1.0 - jnp.abs(src[:, None] - grid), 0.0)


def _scale_translate(x: jax.Array, scale: jax.Array, tx: jax.Array,
                     ty: jax.Array, order: int) -> jax.Array:
    """Uniform scale about the center + shift, as two per-axis matmul
    resamples (separable map -> MXU work, no gathers)."""
    h, w = x.shape[0], x.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    src_y = (jnp.arange(h, dtype=jnp.float32) - cy - ty * h) / scale + cy
    src_x = (jnp.arange(w, dtype=jnp.float32) - cx - tx * w) / scale + cx
    ry = _axis_resample_matrix(src_y, h, order)       # (H, H)
    rx = _axis_resample_matrix(src_x, w, order)       # (W, W)
    out = jnp.einsum("oh,hwc->owc", ry, x)
    return jnp.einsum("pw,owc->opc", rx, out)


def _shear(x: jax.Array, m: jax.Array, axis: int, order: int,
           pad: int) -> jax.Array:
    """out[i, j] = in[i, j + m*(i - ci)] along ``axis`` (the shifted
    axis), i the perpendicular index.  Fractional per-row shifts via TWO
    batched dynamic-slices of mirror-padded rows + a blend — contiguous
    slices are the gather pattern TPU lowers efficiently, unlike the
    per-pixel gathers of a general warp."""
    if axis == 0:                      # shear along H: work transposed
        return jnp.swapaxes(_shear(jnp.swapaxes(x, 0, 1), m, 1, order,
                                   pad), 0, 1)
    h, w = x.shape[0], x.shape[1]
    ci = (h - 1) / 2.0
    t = m * (jnp.arange(h, dtype=jnp.float32) - ci)       # shift per row
    t = jnp.clip(t, -(pad - 1.0), pad - 1.0)
    k = jnp.floor(t) if order else jnp.round(t)
    f = t - k
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    starts = (k + pad).astype(jnp.int32)

    def take(row, s):
        return jax.lax.dynamic_slice(row, (s, 0), (w, row.shape[1]))

    lo = jax.vmap(take)(xp, starts)
    if order == 0:
        return lo
    hi = jax.vmap(take)(xp, starts + 1)
    return lo * (1.0 - f)[:, None, None] + hi * f[:, None, None]


def _warp_fast(x: jax.Array, angle_deg: jax.Array, scale: jax.Array,
               tx: jax.Array, ty: jax.Array, order: int,
               pad: int) -> jax.Array:
    """The TPU-first warp: rotation as three shears (Paeth decomposition
    — batched contiguous dynamic-slices), then uniform scale + shift as
    two per-axis matmuls.  Same geometry as ``_warp`` (uniform scale
    commutes with rotation); interpolation differs slightly (sequential
    1D blends vs one 2D bilinear), which is immaterial for augmentation
    and ~20x faster on TPU (module docstring measurements)."""
    # negated so the composed sampling map R(theta) matches _warp's
    theta = -jnp.deg2rad(angle_deg)
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    out = _shear(x, a, 1, order, pad)
    out = _shear(out, b, 0, order, pad)
    out = _shear(out, a, 1, order, pad)
    return _scale_translate(out, scale, tx, ty, order)


def _rot90s(x: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.switch(k, [lambda a: a,
                              lambda a: jnp.rot90(a, 1),
                              lambda a: jnp.rot90(a, 2),
                              lambda a: jnp.rot90(a, 3)], x)


def make_device_augment(p_flip: float = 0.5, p_warp: float = 0.5,
                        p_jitter: float = 0.3, max_angle: float = 30.0,
                        scale_range: tp.Tuple[float, float] = (0.9, 1.1),
                        max_shift: float = 0.0625,
                        value_range: float = 1.0,
                        fast_warp: bool = True,
                        warp_mode: str = "batch"):
    """Returns jitted ``fn(key, images, masks) -> (images, masks)`` for
    (B, H, W, C) float32 batches.  Defaults mirror ``augment_pair``
    (albumentations ShiftScaleRotate/flip/jitter defaults);
    ``value_range`` is the image intensity ceiling (1.0 for normalized
    inputs, 255.0 for raw).  ``fast_warp`` uses the shear/matmul warp
    (TPU-fast, default); False keeps the gather-based ``map_coordinates``
    reference warp for A/B.  ``warp_mode``: "batch" (default) draws ONE
    angle/scale/shift per call — per-row slice starts are then shared
    across the batch, the pattern TPU lowers fast (~30 ms/b128 for the
    whole op set); flips/rot90/jitter and the warp/no-warp coin stay
    per-sample, and params still vary every step.  "sample" draws per
    sample (max diversity; per-sample slice starts are latency-bound,
    ~180 ms/b128)."""
    import math
    if warp_mode not in ("batch", "sample"):
        raise ValueError(f"warp_mode must be 'batch' or 'sample', "
                         f"got {warp_mode!r}")
    shear_bound = max(math.tan(math.radians(max_angle) / 2.0),
                      math.sin(math.radians(min(max_angle, 90.0))))

    def one(key, img, msk, warp_params):
        kh, kv, kr, kw, kp, kj, kg = jax.random.split(key, 7)
        pad = max(2, int(math.ceil(
            shear_bound * max(img.shape[0], img.shape[1]) / 2.0)) + 2)
        flip_h = jax.random.bernoulli(kh, p_flip)
        img = jnp.where(flip_h, img[:, ::-1], img)
        msk = jnp.where(flip_h, msk[:, ::-1], msk)
        flip_v = jax.random.bernoulli(kv, p_flip)
        img = jnp.where(flip_v, img[::-1], img)
        msk = jnp.where(flip_v, msk[::-1], msk)
        if img.shape[0] == img.shape[1]:  # rot90 square-only (host parity)
            k = jax.random.randint(kr, (), 0, 4)
            img = _rot90s(img, k)
            msk = _rot90s(msk, k)
        do_warp = jax.random.bernoulli(kw, p_warp)
        if warp_params is None:  # per-sample params (warp_mode="sample")
            angle, scale, tx, ty = _draw_warp_params(kp)
        else:                    # batch-shared params (warp_mode="batch")
            angle, scale, tx, ty = warp_params
        warp = (lambda t, o: _warp_fast(t, angle, scale, tx, ty, o, pad)
                ) if fast_warp else (
                lambda t, o: _warp(t, angle, scale, tx, ty, o))
        img = jnp.where(do_warp, warp(img, 1), img)
        msk = jnp.where(do_warp, warp(msk, 0), msk)
        do_jit = jax.random.bernoulli(kj, p_jitter)
        gain, bias = jax.random.uniform(kg, (2,))
        jittered = jnp.clip(img * (0.8 + gain * 0.4)
                            + (bias * 0.1 - 0.05) * value_range,
                            0.0, value_range)
        img = jnp.where(do_jit, jittered, img)
        return img, msk

    def _draw_warp_params(kp):
        angle, scale01, tx01, ty01 = jax.random.uniform(kp, (4,))
        angle = (angle * 2.0 - 1.0) * max_angle
        scale = scale_range[0] + scale01 * (scale_range[1] - scale_range[0])
        tx = (tx01 * 2.0 - 1.0) * max_shift
        ty = (ty01 * 2.0 - 1.0) * max_shift
        return angle, scale, tx, ty

    @jax.jit
    def augment(key, images, masks):
        images = jnp.asarray(images, jnp.float32)
        masks = jnp.asarray(masks, jnp.float32)
        kb, ks = jax.random.split(key)
        keys = jax.random.split(ks, images.shape[0])
        params = _draw_warp_params(kb) if warp_mode == "batch" else None
        return jax.vmap(one, in_axes=(0, 0, 0, None))(
            keys, images, masks, params)

    return augment


def augment_stream_key(seed: int, epoch: int, step: int) -> jax.Array:
    """The (seed, epoch, step)-keyed rng stream: reproducible per run and
    replayed by exact resume's ``set_epoch`` fast-forward."""
    key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(jax.random.fold_in(key, epoch), step)
