"""Measure the north-star DENOMINATOR: the Keras reference itself, on TPU.

BASELINE.md requires "UNet++ 256² >= 5x Keras-on-TPU images/sec/chip".
TensorFlow cannot reach this TPU (the axon tunnel is a JAX PJRT plugin),
but TF 2.16+ ships Keras 3, whose backend is selected by the KERAS_BACKEND
env var at import time — so the actual reference graph-building code
(/root/reference/TensorFlow/2DCNN/models/unet_variants.py, executed, not
copied) can run its own `model.fit` through Keras-on-JAX on the SAME chip.
That is the most literal "Keras on TPU" available in this environment.

Run:  KERAS_BACKEND=jax python benchmarks/keras_denominator.py [decoder]
``decoder`` (default UNetPP) measures any reference decoder family at the
same 256^2/width-32 config — e.g. MultiResUNet, the framework's slowest
family, so "beats Keras" is measured rather than assumed there.
Merges the result into benchmarks/RESULTS.json under "keras_on_tpu".
"""
import json
import os
import sys
import time

os.environ.setdefault("KERAS_BACKEND", "jax")

import numpy as np

REF_2D = "/root/reference/TensorFlow/2DCNN"


def build_reference_model(batch, size, decoder="UNetPP"):
    import keras
    import tensorflow as tf

    # Keras-2 compat shim the reference needs under Keras 3 (same patch as
    # tests/test_parity_keras.py): Activation('LeakyReLU') must resolve.
    # tf.keras is the keras._tf_keras mirror tree, so patch BOTH bindings.
    orig_activation = keras.layers.Activation

    def patched(activation, **kw):
        if activation == "LeakyReLU":
            return keras.layers.LeakyReLU()
        if isinstance(activation, str):
            try:
                keras.activations.get(activation)
            except (ValueError, KeyError):
                activation = activation.lower()
        return orig_activation(activation, **kw)

    keras.layers.Activation = patched
    tf.keras.layers.Activation = patched
    # the reference imports `tensorflow as tf` and uses tf.keras.*; under
    # TF>=2.16 tf.keras IS this keras-3 module, which follows KERAS_BACKEND
    sys.path.insert(0, REF_2D)
    from models import unet_variants  # noqa: executed for measurement only

    builder = unet_variants.unet_model_builder(
        decoder, size, size, 32, 4, num_channels=3, output_nums=1,
        final_activation="sigmoid", train_mode="from_scratch")
    return builder.ResNet50()  # encoder method irrelevant in from_scratch


def main() -> None:
    import jax
    import keras

    print(f"keras {keras.__version__} backend={keras.backend.backend()} "
          f"devices={jax.devices()}", flush=True)
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = int(os.environ.get("KERAS_BENCH_BATCH", 32 if on_tpu else 2))
    size = 256 if on_tpu else 64
    steps = 10 if on_tpu else 2

    decoder = sys.argv[1] if len(sys.argv) > 1 else "UNetPP"
    model = build_reference_model(batch, size, decoder)
    model.compile(optimizer=keras.optimizers.Adam(1e-3),
                  loss="binary_crossentropy", jit_compile=True)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch * steps, size, size, 3)).astype(np.float32)
    y = (rng.uniform(size=(batch * steps, size, size, 1)) > 0.5
         ).astype(np.float32)

    # epoch 1 = compile + warmup; epochs 2..4 = steady state
    model.fit(x, y, batch_size=batch, epochs=1, verbose=2)
    t0 = time.perf_counter()
    epochs = 3 if on_tpu else 1
    model.fit(x, y, batch_size=batch, epochs=epochs, verbose=2)
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    ips = batch * steps * epochs / dt / n_chips
    result = {
        "keras_on_tpu_%s_%d_train_ips_per_chip"
        % (decoder.lower(), size): round(ips, 2),
        "keras_version": keras.__version__,
        "backend": keras.backend.backend(),
        "platform": jax.devices()[0].platform,
        "batch": batch, "steps_per_epoch": steps, "epochs_timed": epochs,
    }
    print(json.dumps(result))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "RESULTS.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.setdefault("keras_on_tpu", {}).update(result)
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
