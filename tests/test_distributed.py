"""Multi-host input pipeline (parallel.distributed) on the 8-virtual-device
CPU mesh: partition math, process-local global-batch assembly, and the
Trainer consuming global jax.Arrays end-to-end.

Single-process here; the partition and assembly logic is exactly what a
multi-host pod launch runs (jax.make_array_from_process_local_data).
"""
import jax
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    DistributedLoader, batch_sharding, global_batch, make_mesh,
    process_shard_indices, shard_batch, shard_dataset_for_process)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer


def test_process_shard_partition_math():
    """Strided shards are disjoint, EXACTLY equal-sized (a process with
    one extra example would run one extra step and deadlock the others'
    collectives), and cover all but the n mod P tail."""
    n, P = 103, 8
    shards = [process_shard_indices(n, p, P) for p in range(P)]
    all_idx = np.concatenate(shards)
    assert len(set(all_idx.tolist())) == len(all_idx)
    sizes = [len(s) for s in shards]
    assert sizes == [n // P] * P
    assert len(all_idx) == n - n % P
    # stability: appending data never reshuffles earlier assignments
    grown = process_shard_indices(n + P, 3, P)
    np.testing.assert_array_equal(grown[:len(shards[3])], shards[3])


def test_process_shard_defaults_to_single_process():
    np.testing.assert_array_equal(process_shard_indices(10), np.arange(10))
    with pytest.raises(ValueError, match="process_index"):
        process_shard_indices(10, 5, 4)


def test_shard_dataset_for_process():
    class _FakeDS:
        def __len__(self):
            return 10

        def load_pair(self, i):
            return np.full((2, 1), i), np.full((2, 1), -i)

    ds = _FakeDS()
    s1 = shard_dataset_for_process(ds, 1, 4)  # indices 1, 5 (floor(10/4)=2)
    assert len(s1) == 2
    img, msk = s1.load_pair(1)
    assert img[0, 0] == 5 and msk[0, 0] == -5
    # single process: identity view
    s_all = shard_dataset_for_process(ds, 0, 1)
    assert len(s_all) == 10


def test_global_batch_equals_shard_batch():
    """Single-process global assembly must equal the device_put path in
    values AND placement."""
    mesh = make_mesh(jax.devices(), data=8, model=1)
    x = np.random.default_rng(0).normal(size=(16, 8, 3)).astype(np.float32)
    g = global_batch(mesh, {"x": x})["x"]
    d = shard_batch(mesh, {"x": x})["x"]
    np.testing.assert_array_equal(np.asarray(g), np.asarray(d))
    assert g.sharding.is_equivalent_to(batch_sharding(mesh, x.ndim), x.ndim)
    with pytest.raises(ValueError, match="batch axis"):
        global_batch(mesh, {"bad": np.float32(3.0)})


def test_shard_batch_passes_global_arrays_through():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    x = np.zeros((8, 4, 1), np.float32)
    g = global_batch(mesh, x)
    assert shard_batch(mesh, g) is g


def test_trainer_consumes_distributed_loader():
    """fit/evaluate on DistributedLoader output equals the host-numpy
    path exactly (same seed, same batches, same arithmetic)."""
    mesh = make_mesh(jax.devices(), data=8, model=1)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32, 32, 1)).astype(np.float32)
    y = (rng.uniform(size=(16, 32, 32, 1)) > 0.5).astype(np.float32)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=1, final_activation="sigmoid")

    def run(loader):
        tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-3,
                     mesh=mesh, seed=7)
        tr.init_state(x[:8])
        hist = tr.fit(loader, epochs=2, verbose=0)
        return hist["loss"]

    plain = run(batches(x, y, 8, shuffle=False))
    dist = run(DistributedLoader(batches(x, y, 8, shuffle=False), mesh))
    np.testing.assert_allclose(plain, dist, rtol=1e-6)
