"""CLIP (JAX/linen): model, tokenizer, loader — replaces the vendored
OpenAI CLIP fork (`/root/reference/CLIP/`)."""
from bcosification_tpu.clip import model
from bcosification_tpu.clip.load import available_models, load, load_state_dict_file
from bcosification_tpu.clip.tokenizer import SimpleTokenizer, tokenize
