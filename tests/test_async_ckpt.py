"""Async checkpointing: the commit overlaps training, yet every read path
(exists/restore/a following save/fit-return) joins the in-flight write
first, so the on-disk artifact is always consistent.

New capability over the reference (Keras ModelCheckpoint writes
synchronously inside the epoch-end callback, Train.py:375-379).
"""
import flax.linen as nn
import jax
import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    CheckpointManager, Trainer)


class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        h = nn.relu(nn.Conv(4, (3,))(x))
        return {"out": nn.sigmoid(nn.Conv(1, (1,))(h))}


def _data(n=8, length=32):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, length, 1)).astype(np.float32)
    y = (rng.uniform(size=(n, length, 1)) > 0.5).astype(np.float32)
    return x, y


def _trained(x, y):
    tr = Trainer(_TinyNet(), loss="BinaryCrossentropy", learning_rate=1e-2)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=1, verbose=0)
    return tr


def test_async_save_then_restore_equals(tmp_path):
    x, y = _data()
    tr = _trained(x, y)
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save(tr.state, "best")  # returns before the commit finishes
    assert ckpt.exists("best")  # joins the in-flight write first

    tr2 = Trainer(_TinyNet(), loss="BinaryCrossentropy")
    tr2.init_state(x[:4])
    restored = ckpt.restore(tr2.state, "best")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.device_get(tr.state.params),
                 jax.device_get(restored.params))


def test_back_to_back_async_saves_keep_latest(tmp_path):
    """The second save must join the first commit before overwriting the
    same tree; the restored weights are the LATEST state's."""
    x, y = _data()
    tr = _trained(x, y)
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save(tr.state, "best")
    tr.fit(batches(x, y, 4), epochs=1, verbose=0)  # mutate further
    ckpt.save(tr.state, "best")

    tr2 = Trainer(_TinyNet(), loss="BinaryCrossentropy")
    tr2.init_state(x[:4])
    restored = ckpt.restore(tr2.state, "best")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.device_get(tr.state.params),
                 jax.device_get(restored.params))


def test_previous_best_survives_inflight_async_save(tmp_path):
    """While a new async save commits in the background, the PREVIOUS
    best must stay intact on disk (a kill mid-commit loses nothing):
    the commit targets a .staging sibling and only the post-commit join
    swaps it in."""
    import os
    x, y = _data()
    tr = _trained(x, y)
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    ckpt.save(tr.state, "best")
    ckpt.wait()
    final = str(tmp_path / "best")
    assert os.path.isdir(final)
    ckpt.save(tr.state, "best")  # second commit in flight
    # no join yet: the old final dir must still be there
    assert os.path.isdir(final)
    ckpt.wait()
    assert os.path.isdir(final)
    assert not os.path.isdir(final + ".staging")


def test_fresh_manager_adopts_orphaned_staging(tmp_path):
    """A process killed after the background commit but before the swap
    leaves a complete .staging dir; a fresh manager must adopt it (it is
    the NEWER checkpoint)."""
    x, y = _data()
    tr = _trained(x, y)
    old = CheckpointManager(str(tmp_path))
    old.save(tr.state, "best")
    tr.fit(batches(x, y, 4), epochs=1, verbose=0)  # newer weights
    # simulate the orphan: a completed commit sitting at best.staging
    stage_writer = CheckpointManager(str(tmp_path))
    stage_writer.save(tr.state, "best.staging")

    fresh = CheckpointManager(str(tmp_path))
    tr2 = Trainer(_TinyNet(), loss="BinaryCrossentropy")
    tr2.init_state(x[:4])
    restored = fresh.restore(tr2.state, "best")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.device_get(tr.state.params),
                 jax.device_get(restored.params))


def test_fresh_manager_recovers_mid_swap_kill(tmp_path):
    """Killed between rename(final -> old) and rename(staging -> final):
    only best.old remains; a fresh manager must fall back to it."""
    import os
    x, y = _data()
    tr = _trained(x, y)
    m = CheckpointManager(str(tmp_path))
    m.save(tr.state, "best")
    os.rename(str(tmp_path / "best"), str(tmp_path / "best.old"))

    fresh = CheckpointManager(str(tmp_path))
    assert fresh.exists("best")
    tr2 = Trainer(_TinyNet(), loss="BinaryCrossentropy")
    tr2.init_state(x[:4])
    restored = fresh.restore(tr2.state, "best")
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.device_get(tr.state.params),
                 jax.device_get(restored.params))


def test_finalize_swap_is_primary_process_only(tmp_path, monkeypatch):
    """On a pod, only process 0 may rename on the shared filesystem —
    a non-primary process's _finalize must be a strict no-op."""
    import os
    x, y = _data()
    tr = _trained(x, y)
    m = CheckpointManager(str(tmp_path))
    m.save(tr.state, "best.staging")  # a committed staging dir
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    m._finalize("best")
    assert os.path.isdir(str(tmp_path / "best.staging"))
    assert not os.path.isdir(str(tmp_path / "best"))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    m._finalize("best")
    assert os.path.isdir(str(tmp_path / "best"))


def test_fit_returns_with_durable_async_best(tmp_path):
    """fit() with an async manager must join the commit before returning:
    a FRESH manager (new orbax handle, no shared in-flight state) restores
    the best checkpoint immediately afterwards."""
    x, y = _data()
    tr = Trainer(_TinyNet(), loss="BinaryCrossentropy", learning_rate=1e-2)
    tr.init_state(x[:4])
    ckpt = CheckpointManager(str(tmp_path), async_save=True)
    tr.fit(batches(x, y, 4), epochs=3, verbose=0,
           checkpoint=ckpt, monitor="loss")

    fresh = CheckpointManager(str(tmp_path))
    tr2 = Trainer(_TinyNet(), loss="BinaryCrossentropy")
    tr2.init_state(x[:4])
    restored = fresh.restore(tr2.state, "best")
    for leaf in jax.tree.leaves(jax.device_get(restored.params)):
        assert np.isfinite(leaf).all()
