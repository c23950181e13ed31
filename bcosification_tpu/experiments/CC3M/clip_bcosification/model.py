"""CC3M KD uses the same student builder as ImageNet/clip_bcosification."""
from bcosification_tpu.experiments.ImageNet.clip_bcosification.model import get_model

__all__ = ["get_model"]
