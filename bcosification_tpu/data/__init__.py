from bcosification_tpu.data import presets, transforms
from bcosification_tpu.data.datamodules import ClassificationDataModule
from bcosification_tpu.data.loader import DataLoader, default_collate
from bcosification_tpu.data.sampler import RASampler
from bcosification_tpu.data import cc3m  # registers CC3MDataModule
