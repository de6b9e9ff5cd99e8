"""TensorBoard scalar logging: opt-in per-epoch event files, lazily
importing TF only at the epoch boundary (never inside the compiled
step).  New observability surface over the reference (Keras progress
bars + h5 history only, Train.py:397/425-430)."""
import glob
import os

import flax.linen as nn
import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer


class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return {"out": nn.sigmoid(nn.Conv(1, (3,))(x))}


def test_fit_writes_tensorboard_events(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 1)).astype(np.float32)
    y = (rng.uniform(size=(8, 32, 1)) > 0.5).astype(np.float32)
    tr = Trainer(_TinyNet(), loss="BinaryCrossentropy",
                 metrics=("BinaryAccuracy",))
    tr.init_state(x[:4])
    tb = str(tmp_path / "tb")
    hist = tr.fit(batches(x, y, 4), val_data=batches(x, y, 4,
                                                     shuffle=False),
                  epochs=2, verbose=0, tensorboard_dir=tb)
    events = glob.glob(os.path.join(tb, "events.out.tfevents.*"))
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(events[0]) > 0
    # the scalars actually landed: decode the event file and check tags
    from tensorflow.core.util import event_pb2
    from tensorflow.python.lib.io import tf_record
    tags = set()
    for rec in tf_record.tf_record_iterator(events[0]):
        ev = event_pb2.Event.FromString(rec)
        for v in ev.summary.value:
            tags.add(v.tag)
    for expected in ("loss", "val_loss", "lr", "BinaryAccuracy"):
        assert expected in tags, f"missing scalar {expected}: {tags}"
    assert len(hist["loss"]) == 2


def test_fit_without_tensorboard_never_imports_tf(tmp_path):
    """The default path must not pay the TF import (subprocess check)."""
    import subprocess
    import sys
    code = (
        "import sys\n"
        "sys.modules.pop('tensorflow', None)\n"
        "import numpy as np\n"
        "import flax.linen as nn\n"
        "from tf_1d_2d_segmentation_end2endpipelines_tpu.data import "
        "batches\n"
        "from tf_1d_2d_segmentation_end2endpipelines_tpu.train import "
        "Trainer\n"
        "class N(nn.Module):\n"
        "    @nn.compact\n"
        "    def __call__(self, x, train=False):\n"
        "        return {'out': nn.sigmoid(nn.Conv(1, (3,))(x))}\n"
        "x = np.zeros((4, 16, 1), np.float32)\n"
        "y = np.zeros((4, 16, 1), np.float32)\n"
        "tr = Trainer(N()); tr.init_state(x)\n"
        "tr.fit(batches(x, y, 4), epochs=1, verbose=0)\n"
        "assert 'tensorflow' not in sys.modules, 'TF imported on the "
        "default path'\n"
        "print('NO_TF_OK')\n")
    # hand the subprocess the suite's persistent compile cache (conftest
    # sets it in-process only): without it the fresh interpreter
    # recompiles every run — observed blowing the 600s bound under
    # full-suite CPU load (same root cause as test_cli_module_entry)
    from conftest import _cache
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=_cache,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, env=env)
    assert "NO_TF_OK" in out.stdout, out.stderr[-2000:]
