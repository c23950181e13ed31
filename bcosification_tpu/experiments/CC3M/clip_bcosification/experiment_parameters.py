"""CC3M/clip_bcosification — SigLIP KD on CC3M webdataset shards.

Parity target: `/root/reference/bcos/experiments/CC3M/clip_bcosification/
experiment_parameters.py` (same recipe as the ImageNet KD configs but fed by
the CC3M image pipeline).
"""
import math

from bcosification_tpu.data.presets import (
    CLIPBcosImageNetClassificationPresetEval,
    CLIPBcosImageNetClassificationPresetTrain,
)
from bcosification_tpu.experiments.utils.config_utils import (
    configs_cli,
    create_configs_with_different_seeds,
    update_config,
)
from bcosification_tpu.losses import SigLipLoss
from bcosification_tpu.optim import LRSchedulerFactory, OptimizerFactory

__all__ = ["CONFIGS"]

DEFAULT_BATCH_SIZE = 64
DEFAULT_NUM_EPOCHS = 90
DEFAULT_LR = 1e-4
DEFAULT_CROP_SIZE = 224

DEFAULTS = dict(
    data=dict(
        train_transform=CLIPBcosImageNetClassificationPresetTrain(
            crop_size=DEFAULT_CROP_SIZE
        ),
        test_transform=CLIPBcosImageNetClassificationPresetEval(
            crop_size=DEFAULT_CROP_SIZE
        ),
        batch_size=DEFAULT_BATCH_SIZE,
        num_workers=16,
    ),
    model=dict(
        is_bcos=True,
        args=dict(),
        bcos_args=dict(b=2, max_out=1),
    ),
    criterion=SigLipLoss(),
    test_criterion=SigLipLoss(),
    optimizer=OptimizerFactory(name="Adam", lr=DEFAULT_LR, bcosify=True, b_opt=False),
    lr_scheduler=LRSchedulerFactory(name="cosineannealinglr", epochs=DEFAULT_NUM_EPOCHS),
    trainer=dict(max_epochs=DEFAULT_NUM_EPOCHS),
    use_agc=True,
)


def update_default(new_config):
    return update_config(DEFAULTS, new_config)


CONFIGS = {
    # name grid mirrors the reference exactly (CC3M/clip_bcosification/
    # experiment_parameters.py:77-104): scheduler tag before the
    # `_sigLip_kd_CC3M_bcosification` suffix, cyclicLR only
    "resnet_50_clip_b2_noBias_randomResizedCrop"
    + ("_" + schDLR if schDLR == "cyclicLR" else "")
    + "_sigLip_kd_CC3M_bcosification": update_default(
        dict(
            clip_kd=True,
            model=dict(
                name="resnet50clip",
                bcosify_args=dict(
                    clip_kd=True,
                    fix_b=True,
                    norm_layer="BnUncV2",
                    schDLR=schDLR,
                    use_bias=False,
                ),
            ),
        )
    )
    for schDLR in ["cosineAnnealingLR", "cyclicLR"]
}
CONFIGS.update(
    create_configs_with_different_seeds(dict(CONFIGS), seeds=[420, 1337])
)

if __name__ == "__main__":
    configs_cli(CONFIGS)
