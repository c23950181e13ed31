"""The B-cosification conversion engine (PyTree surgery, no torch runtime dep)."""
from bcosification_tpu.bcosify import params, torch_import
from bcosification_tpu.bcosify.engine import build_bcosified_resnet
