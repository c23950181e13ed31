from bcosification_tpu.models import resnet
from bcosification_tpu.models.bcosify_net import BcosifyNetwork, Normalize
