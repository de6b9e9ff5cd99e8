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

Measured cost (v5e, b128 256x256x3): flips/rot90/jitter (``p_warp=0``)
~26 ms/batch — ~10% of the b128 train step, effectively free.  The
shift-scale-rotate warp is GATHER-bound (``map_coordinates`` does 4
gathers/pixel, and TPU lowers general gathers slowly): ~620 ms/batch,
more than the train step itself.  If you need the warp and have host
cores, the host path (INI ``augment``) overlaps with device compute and
is the better choice; this path wins on host-starved setups or for the
warp-free op set.
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


def _rot90s(x: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.switch(k, [lambda a: a,
                              lambda a: jnp.rot90(a, 1),
                              lambda a: jnp.rot90(a, 2),
                              lambda a: jnp.rot90(a, 3)], x)


def make_device_augment(p_flip: float = 0.5, p_warp: float = 0.5,
                        p_jitter: float = 0.3, max_angle: float = 30.0,
                        scale_range: tp.Tuple[float, float] = (0.9, 1.1),
                        max_shift: float = 0.0625,
                        value_range: float = 1.0):
    """Returns jitted ``fn(key, images, masks) -> (images, masks)`` for
    (B, H, W, C) float32 batches.  Defaults mirror ``augment_pair``
    (albumentations ShiftScaleRotate/flip/jitter defaults);
    ``value_range`` is the image intensity ceiling (1.0 for normalized
    inputs, 255.0 for raw)."""

    def one(key, img, msk):
        kh, kv, kr, kw, kp, kj, kg = jax.random.split(key, 7)
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
        angle, scale01, tx01, ty01 = jax.random.uniform(kp, (4,))
        angle = (angle * 2.0 - 1.0) * max_angle
        scale = scale_range[0] + scale01 * (scale_range[1] - scale_range[0])
        tx = (tx01 * 2.0 - 1.0) * max_shift
        ty = (ty01 * 2.0 - 1.0) * max_shift
        img = jnp.where(do_warp, _warp(img, angle, scale, tx, ty, 1), img)
        msk = jnp.where(do_warp, _warp(msk, angle, scale, tx, ty, 0), msk)
        do_jit = jax.random.bernoulli(kj, p_jitter)
        gain, bias = jax.random.uniform(kg, (2,))
        jittered = jnp.clip(img * (0.8 + gain * 0.4)
                            + (bias * 0.1 - 0.05) * value_range,
                            0.0, value_range)
        img = jnp.where(do_jit, jittered, img)
        return img, msk

    @jax.jit
    def augment(key, images, masks):
        images = jnp.asarray(images, jnp.float32)
        masks = jnp.asarray(masks, jnp.float32)
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(one)(keys, images, masks)

    return augment


def augment_stream_key(seed: int, epoch: int, step: int) -> jax.Array:
    """The (seed, epoch, step)-keyed rng stream: reproducible per run and
    replayed by exact resume's ``set_epoch`` fast-forward."""
    key = jax.random.PRNGKey(seed)
    return jax.random.fold_in(jax.random.fold_in(key, epoch), step)
