"""Packed dual-conv execution for the MultiRes family (ops/blocks.py).

MultiResBlock and every ResPath unit issue two convs over the same input
(the 1x1 shortcut + the kxk main/branch conv — reference ``MultiResBlock``/
``ResPath``, /root/reference/TensorFlow/2DCNN/models/unet_variants.py:85-122).
The packed path merges the pair into ONE conv (1x1 kernel zero-embedded at
the kxk center, output channels concatenated) and applies each block's BN to
its channel slice.  Contract under test:

  - the parameter tree is BIT-IDENTICAL packed vs unpacked (paths, shapes,
    and initial values — checkpoints are interchangeable, ``pack`` can flip
    per-build);
  - train/eval forwards and batch_stats updates match to float tolerance
    (zero kernel taps contribute exact zeros; per-slice BN == per-branch BN);
  - gradients match.  Pre-BN conv *bias* grads are mathematically zero (a
    constant shift cancels in normalization), so those leaves are pure
    cancellation noise and get an absolute-only tolerance;
  - ``pack_override`` forces either mode regardless of env/field (the Keras
    import call-order path relies on forcing unpacked);
  - full MultiResUNet / KSSNet forwards agree packed vs unpacked, and a
    checkpoint trained unpacked evaluates identically under packed.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.ops.blocks import (
    MultiResBlock, ResPath, pack_override)


def _tree_paths(tree):
    return [(jax.tree_util.keystr(p), v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]]


CASES = [
    (MultiResBlock, dict(model_width=32, alpha=1.0), (2, 16, 16, 7)),
    (MultiResBlock, dict(model_width=13, alpha=1.5), (2, 12, 12, 3)),
    (MultiResBlock, dict(model_width=16), (2, 24, 5)),          # 1D rank
    (ResPath, dict(length=3, model_width=16), (2, 16, 16, 7)),
    (ResPath, dict(length=2, model_width=8, kernel=3), (2, 24, 5)),  # 1D
]


@pytest.mark.parametrize("cls,kw,shape", CASES)
def test_packed_matches_unpacked(cls, kw, shape):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), shape)
    mu, mp = cls(pack=False, **kw), cls(pack=True, **kw)
    vu = mu.init(rng, x, True)
    vp = mp.init(rng, x, True)
    assert (jax.tree_util.tree_structure(vu)
            == jax.tree_util.tree_structure(vp))
    jax.tree_util.tree_map(np.testing.assert_array_equal, vu, vp)

    yu, su = mu.apply(vu, x, True, mutable=["batch_stats"])
    yp, sp = mp.apply(vp, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(yu, yp, rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        su, sp)

    # Perturb params (identically on both sides) and weight the loss with a
    # random field so grads that are only zero *at init* (e.g. the final
    # BN's bias under a symmetric loss) become non-degenerate; pre-BN conv
    # bias grads stay structurally zero (shift cancels in normalization).
    nrng = np.random.default_rng(7)

    def _perturb(t):
        return jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                nrng.normal(0, 0.05, a.shape).astype(np.float32)), t)

    pu = _perturb(vu["params"])
    nrng = np.random.default_rng(7)
    pp = _perturb(vp["params"])
    w = jax.random.normal(jax.random.PRNGKey(3), shape[:-1] + (1,))

    def loss(p, m, v):
        y, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                       x, True, mutable=["batch_stats"])
        return jnp.sum(y * w)

    gu = jax.grad(lambda p: loss(p, mu, vu))(pu)
    gp = jax.grad(lambda p: loss(p, mp, vp))(pp)
    flat_u = jax.tree_util.tree_flatten_with_path(gu)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    for (path, a), (_, b) in zip(flat_u, flat_p):
        key = jax.tree_util.keystr(path)
        if key.endswith("['bias']") and "Conv_0" in key:
            # pre-BN bias: true grad is 0 (shift cancels in normalization);
            # both sides are summation noise — absolute bound only
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-3,
                                       err_msg=key)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                       err_msg=key)

    # eval mode (running stats)
    np.testing.assert_allclose(mu.apply(vu, x, False),
                               mp.apply(vp, x, False),
                               rtol=1e-5, atol=1e-5)


def test_pack_override_forces_mode():
    x = jnp.zeros((1, 8, 8, 3))
    m = MultiResBlock(model_width=8)            # pack=None -> env default
    with pack_override(False):
        v1 = m.init(jax.random.PRNGKey(0), x, True)
    with pack_override(True):
        v2 = m.init(jax.random.PRNGKey(0), x, True)
    # identical trees either way is the whole point
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    jax.tree_util.tree_map(np.testing.assert_array_equal, v1, v2)
    # override beats an explicit field
    me = MultiResBlock(model_width=8, pack=True)
    with pack_override(False):
        v3 = me.init(jax.random.PRNGKey(0), x, True)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v1, v3)


@pytest.mark.skipif(not os.environ.get("TPUSEG_FULL_TESTS"),
                    reason="regression-frozen proof; ~35s/case on the "
                    "1-core host — TPUSEG_FULL_TESTS=1 lane")
@pytest.mark.parametrize("decoder", ["MultiResUNet", "KSSNet"])
def test_full_model_packed_forward(decoder):
    """End-to-end: SegModel builds route MRB/ResPath through the packed path
    (env-independent via pack_override) and agree with unpacked."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    model = SegModel(decoder_name=decoder, model_width=8, model_depth=3,
                     output_nums=1, final_activation="sigmoid")
    with pack_override(False):
        vu = model.init(jax.random.PRNGKey(0), x)
        yu = model.apply(vu, x)["out"]
    with pack_override(True):
        vp = model.init(jax.random.PRNGKey(0), x)
        yp = model.apply(vp, x)["out"]  # packed-init params, packed apply
        yx = model.apply(vu, x)["out"]  # unpacked-trained params, packed
    assert (jax.tree_util.tree_structure(vu)
            == jax.tree_util.tree_structure(vp))
    jax.tree_util.tree_map(np.testing.assert_array_equal, vu, vp)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yx),
                               rtol=1e-5, atol=1e-5)
