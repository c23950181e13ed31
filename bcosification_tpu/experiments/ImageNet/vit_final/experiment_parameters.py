"""ImageNet/vit_final — from-scratch (non-converted) SimpleViT configs, both
standard baselines and B-cos variants.

Parity target: `/root/reference/bcos/experiments/ImageNet/vit_final/
experiment_parameters.py`: batch 128 (64 for big models) x8 = 1024/2048 eff.,
90 epochs, Adam 1e-3, cosine + 10k/50k-step linear warmup, AGC, mixup 0.2,
RandAugment train preset.
"""
import math

from bcosification_tpu.data.presets import (
    ImageNetClassificationPresetEval,
    ImageNetClassificationPresetTrain,
)
from bcosification_tpu.experiments.utils.config_utils import (
    configs_cli,
    create_configs_with_different_seeds,
    update_config,
)
from bcosification_tpu.losses import (
    BinaryCrossEntropyLoss,
    CrossEntropyLoss,
    UniformOffLabelsBCEWithLogitsLoss,
)
from bcosification_tpu.modules import norms
from bcosification_tpu.optim import LRSchedulerFactory, OptimizerFactory

__all__ = ["CONFIGS"]

NUM_CLASSES = 1_000
DEFAULT_BATCH_SIZE = 128
DEFAULT_NUM_EPOCHS = 90
DEFAULT_LR = 1e-3
DEFAULT_CROP_SIZE = 224

DEFAULT_LR_SCHEDULE = LRSchedulerFactory(
    name="cosineannealinglr",
    epochs=DEFAULT_NUM_EPOCHS,
    warmup_method="linear",
    warmup_steps=10_000,
    interval="step",
    warmup_decay=0.01,
)
LONG_WARM_SCHEDULE = LRSchedulerFactory(
    name="cosineannealinglr",
    epochs=DEFAULT_NUM_EPOCHS,
    warmup_method="linear",
    warmup_steps=50_000,
    interval="step",
    warmup_decay=0.01,
)

DEFAULTS = dict(
    data=dict(
        batch_size=DEFAULT_BATCH_SIZE,
        num_workers=16,
        num_classes=NUM_CLASSES,
        mixup_alpha=0.2,
    ),
    model=dict(args=dict(num_classes=NUM_CLASSES)),
    lr_scheduler=DEFAULT_LR_SCHEDULE,
    trainer=dict(max_epochs=DEFAULT_NUM_EPOCHS),
    use_agc=True,
)


def update_default(new_config):
    return update_config(DEFAULTS, new_config)


def is_big_model(model_name: str) -> bool:
    return "_l_" in model_name or "simple_vit_b" in model_name


SIMPLE_VIT_ARCHS = [
    "simple_vit_ti_patch16_224",
    "simple_vit_s_patch16_224",
    "simple_vit_b_patch16_224",
    "simple_vit_l_patch16_224",
    "vitc_s_patch1_14",
    "vitc_ti_patch1_14",
    "vitc_b_patch1_14",
    "vitc_l_patch1_14",
]

baseline = {
    name: update_default(
        dict(
            data=dict(
                batch_size=DEFAULT_BATCH_SIZE
                if not is_big_model(name)
                else DEFAULT_BATCH_SIZE // 2,
                train_transform=ImageNetClassificationPresetTrain(
                    crop_size=DEFAULT_CROP_SIZE, is_bcos=False
                ),
                test_transform=ImageNetClassificationPresetEval(
                    crop_size=DEFAULT_CROP_SIZE, is_bcos=False
                ),
            ),
            model=dict(
                is_bcos=False,
                name=name,
                args=dict(
                    # plain LN + plain GELU per the reference's standard
                    # config (vit_final/experiment_parameters.py:113-115 —
                    # nn.LayerNorm/nn.GELU, no explanation-mode detach);
                    # norm2d stays detachable like the reference's
                    # DetachableGNLayerNorm2d.
                    norm_layer=norms.PlainLayerNorm,
                    channels=3,
                    norm2d_layer=norms.DetachableGNLayerNorm2d,
                    act_layer="gelu_plain",
                ),
            ),
            # plain (non-B-cos) baselines train with softmax CE + AdamW
            # (wd 1e-4) + norm-clip 1.0 instead of AGC in the reference
            # (vit_final/experiment_parameters.py:119-132)
            criterion=CrossEntropyLoss(),
            test_criterion=CrossEntropyLoss(),
            optimizer=OptimizerFactory("AdamW", lr=DEFAULT_LR, weight_decay=0.0001),
            use_agc=False,
            trainer=dict(gradient_clip_val=1.0),
            lr_scheduler=DEFAULT_LR_SCHEDULE
            if not is_big_model(name)
            else LONG_WARM_SCHEDULE,
        )
    )
    for name in SIMPLE_VIT_ARCHS
}

bcos = {
    f"bcos_{name}": update_default(
        dict(
            data=dict(
                batch_size=DEFAULT_BATCH_SIZE
                if not is_big_model(name)
                else DEFAULT_BATCH_SIZE // 2,
                train_transform=ImageNetClassificationPresetTrain(
                    crop_size=DEFAULT_CROP_SIZE, is_bcos=True
                ),
                test_transform=ImageNetClassificationPresetEval(
                    crop_size=DEFAULT_CROP_SIZE, is_bcos=True
                ),
            ),
            model=dict(
                is_bcos=True,
                name=name,
                args=dict(
                    norm_layer=norms.NoBias(norms.DetachableLayerNorm),
                    channels=6,
                    norm2d_layer=norms.NoBias(norms.DetachableGNLayerNorm2d),
                    act_layer="identity",
                ),
                bcos_args=dict(b=2, max_out=1),
                logit_bias=math.log(1 / (NUM_CLASSES - 1)),
            ),
            criterion=UniformOffLabelsBCEWithLogitsLoss(),
            test_criterion=BinaryCrossEntropyLoss(),
            optimizer=OptimizerFactory("Adam", lr=DEFAULT_LR),
            lr_scheduler=DEFAULT_LR_SCHEDULE
            if not is_big_model(name)
            else LONG_WARM_SCHEDULE,
        )
    )
    for name in SIMPLE_VIT_ARCHS
}

CONFIGS = dict()
CONFIGS.update(baseline)
CONFIGS.update(bcos)

if __name__ == "__main__":
    configs_cli(CONFIGS)
