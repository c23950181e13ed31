"""Model zoo — parity with `/root/reference/bcos/models/`."""
from bcosification_tpu.models import convnext, densenet, pretrained, resnet, vgg, vit
from bcosification_tpu.models.bcosify_net import BcosifyNetwork, Normalize
