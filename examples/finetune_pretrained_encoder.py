"""Two-stage training with a pretrained encoder (the reference's fine-tune
flow, 2D notebook cells 53-55): stage 1 trains with the backbone frozen,
stage 2 reloads the checkpoint, unfreezes, and drops the LR."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    batches, synthetic_images)
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    CheckpointManager, Trainer)


def main():
    x, y = synthetic_images(16, size=64)
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=4,
                     train_mode="pretrained_encoder", backbone="MobileNetV2")
    ckpt = CheckpointManager("/tmp/finetune_demo")

    # stage 1: frozen encoder (is_base_model_trainable=False)
    tr = Trainer(model, loss="BCEDiceLoss", learning_rate=2e-4,
                 frozen_tokens=("Backbone",))
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=2, checkpoint=ckpt, monitor="loss")

    # stage 2: unfreeze, reload best, fine-tune at 5e-5 (notebook cell 54)
    tr2 = Trainer(model, loss="BCEDiceLoss", learning_rate=5e-5)
    tr2.init_state(x[:4])
    tr2.state = ckpt.restore(tr2.state, "best")
    tr2.fit(batches(x, y, 4), epochs=2, checkpoint=ckpt, monitor="loss")


if __name__ == "__main__":
    main()
