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

    # random-init b=2 stacks CONTRACT (|cos|-scales < 1 at every layer), so a
    # fresh model emits ~1e-20 logits and the rendered map would be alpha-floor
    # noise. Calibrate the BN gammas until logits are O(1) — the same pattern
    # the test oracles use. With real pretrained weights, skip this.
    def scale_gammas(vars_, factor):
        def f(path, leaf):
            keys = [str(getattr(p, "key", p)) for p in path]
            return leaf * factor if keys[-1] == "weight" and leaf.ndim == 1 else leaf

        return dict(vars_, params=jax.tree_util.tree_map_with_path(f, vars_["params"]))

    import math

    def n_gamma_leaves(vars_):
        return sum(
            1
            for path, leaf in jax.tree_util.tree_leaves_with_path(vars_["params"])
            if str(getattr(path[-1], "key", path[-1])) == "weight" and leaf.ndim == 1
        )

    fwd = jax.jit(lambda v, x: net.apply(v, x, train=False))
    logit_bias = -math.log(1000 - 1)  # LogitLayer offset; measure NET of it
    # a fresh b=2 RN50 contracts so hard the fp32 logits underflow to exact 0:
    # bootstrap with x2-per-gamma rounds (x2^53 overall) until measurable...
    mag = float(jnp.abs(fwd(variables, x) - logit_bias).max())
    for _ in range(8):
        if mag > 0.0:
            break
        variables = scale_gammas(variables, 2.0)
        mag = float(jnp.abs(fwd(variables, x) - logit_bias).max())
    # ...then solve: the net is (approximately) 1-homogeneous in each
    # per-layer gamma, so a common factor f over n layers scales logits ~f^n
    for _ in range(10):
        if 0.5 < mag < 50.0:
            break
        f = (5.0 / mag) ** (1.0 / n_gamma_leaves(variables))
        variables = scale_gammas(variables, f)
        mag = float(jnp.abs(fwd(variables, x) - logit_bias).max())
    print(f"calibrated |logit - bias| magnitude: {mag:.3g}")

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
