"""Minimal end-to-end example: build a B-cosified ResNet-50, run one batch,
and render a dynamic-linear explanation (the reference's `model.explain(x)`,
/root/reference/bcos/common.py:92-188) to a PNG.

Runs anywhere (CPU or TPU) with no weights or datasets:

    BCOS_PLATFORM=cpu python examples/explain_minimal.py [out.png]

With real weights, point the pretrained registry at them first
(scripts/import_torch_checkpoint.py + $BCOS_WEIGHTS_DIR).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

from bcosification_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bcosification_tpu.bcosify.engine import build_bcosified_resnet  # noqa: E402
from bcosification_tpu.data.transforms import AddInverse  # noqa: E402
from bcosification_tpu.explain import core as explain  # noqa: E402


def main(out_path="explanation.png"):
    model_config = {
        "name": "resnet50",
        "bcosify_args": {
            "fix_b": True, "use_bias": False, "norm_layer": "BnUncV2",
            "gap": True, "act_layer": True,
        },
        "bcos_args": {"b": 2},
    }
    net, variables = build_bcosified_resnet(model_config, None, input_size=224)

    # a synthetic image; AddInverse encodes [r,g,b,1-r,1-g,1-b]
    rgb = np.random.default_rng(0).random((1, 224, 224, 3), dtype=np.float32)
    x = jnp.asarray(AddInverse()(rgb))

    explain_fn = explain.make_explain_fn(net)  # jitted fused fwd+VJP
    out = explain_fn(variables, x)
    cls = int(out["prediction"][0])
    print(f"prediction: class {cls}  logit {float(out['logits'][0, cls]):.4f}")

    rgba = np.asarray(out["explanation"][0])  # gradient_to_image rendering
    from PIL import Image

    Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(out_path)
    print(f"explanation written to {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
