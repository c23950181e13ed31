"""Released-weights registry: the reference URL table, the npz round trip,
and the torch-checkpoint import tool (ref bcos/models/pretrained.py:44-125)."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_pretrained_url_table():
    from bcosification_tpu.models.pretrained import pretrained_url, pretrained_urls

    urls = pretrained_urls()
    assert set(urls) == {"bcos_final", "bcos_final_long", "vit_final"}
    assert sum(len(v) for v in urls.values()) == 34
    u = pretrained_url("resnet_50")
    assert u and u.startswith("https://github.com/B-cos/B-cos-v2/releases/") \
        and "resnet_50" in u
    # registry-style names normalise to experiment names
    assert pretrained_url("resnet18") == urls["bcos_final"]["resnet_18"]
    assert pretrained_url("densenet121") == urls["bcos_final"]["densenet_121"]
    assert pretrained_url("nonexistent_model_xyz") is None


def test_npz_roundtrip(tmp_path, monkeypatch):
    """strip/export -> BCOS_WEIGHTS_DIR -> load_model restores every leaf."""
    from flax import linen as nn

    from bcosification_tpu.models import pretrained
    from scripts.import_torch_checkpoint import write_npz

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            x = nn.Dense(4, name="d")(x.reshape((x.shape[0], -1)))
            return x

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(3), jnp.ones((1, 2, 2, 6)))

    path = write_npz(variables, tmp_path, "tiny_rt", sha_suffix=False)
    assert path.name == "tiny_rt.npz"

    monkeypatch.setitem(pretrained._REGISTRY, "tiny_rt",
                        lambda: (model, model.init(jax.random.PRNGKey(9),
                                                   jnp.ones((1, 2, 2, 6)))))
    monkeypatch.setenv("BCOS_WEIGHTS_DIR", str(tmp_path))
    _, restored = pretrained.load_model("tiny_rt", pretrained=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, variables,
    )


def test_npz_sha_stamped_resolves(tmp_path, monkeypatch):
    """The import/strip tools' DEFAULT output is <name>-<sha8>.npz; the
    registry lookup must find it (r5 review: it only checked the bare
    <name>.npz, silently returning random init for tool-produced files)."""
    from flax import linen as nn

    from bcosification_tpu.models import pretrained
    from scripts.import_torch_checkpoint import write_npz

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False, explain=False):
            return nn.Dense(4, name="d")(x.reshape((x.shape[0], -1)))

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(3), jnp.ones((1, 2, 2, 6)))
    path = write_npz(variables, tmp_path, "tiny_sha", sha_suffix=True)
    assert path.name.startswith("tiny_sha-") and path.name.endswith(".npz")

    monkeypatch.setitem(pretrained._REGISTRY, "tiny_sha",
                        lambda: (model, model.init(jax.random.PRNGKey(9),
                                                   jnp.ones((1, 2, 2, 6)))))
    monkeypatch.setenv("BCOS_WEIGHTS_DIR", str(tmp_path))
    _, restored = pretrained.load_model("tiny_sha", pretrained=True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored, variables,
    )


def test_import_prefix_selection_never_merges(tmp_path):
    """A PL checkpoint holding BOTH model.* and ema.module.* sets: exactly
    one is selected by prefix (the reference's strip_checkpoints filter),
    never a dict-order-dependent merge (r5 review); nested wrappers strip
    fully."""
    torch = pytest.importorskip("torch")
    from scripts.import_torch_checkpoint import load_torch_state_dict

    ckpt = tmp_path / "both.pth"
    torch.save(
        {
            "state_dict": {
                "model.fc.weight": torch.ones(2, 2),
                "ema.module.model.fc.weight": torch.zeros(2, 2),
            }
        },
        ckpt,
    )
    plain = load_torch_state_dict(str(ckpt))
    assert set(plain) == {"fc.weight"}
    assert float(np.asarray(plain["fc.weight"]).sum()) == 4.0  # model.* set
    ema = load_torch_state_dict(str(ckpt), use_ema=True)
    assert set(ema) == {"fc.weight"}  # ema.module.model. fully stripped
    assert float(np.asarray(ema["fc.weight"]).sum()) == 0.0  # ema set


def test_import_torch_checkpoint_tool(tmp_path, rng):
    """.pth (PL-prefixed) -> convert through the bcosify recipe -> npz whose
    arrays equal a direct conversion from the same state dict."""
    import torch

    from test_bcosify_engine import TorchMiniResNet, _randomize_bn_stats, _mini_build
    import bcosification_tpu.bcosify.engine as eng
    from scripts.import_torch_checkpoint import (
        convert, load_torch_state_dict, write_npz,
    )

    tmodel = TorchMiniResNet()
    _randomize_bn_stats(tmodel, rng)
    tmodel.eval()
    # a PL-style checkpoint file with 'model.' prefixes
    ckpt = {"state_dict": {f"model.{k}": v for k, v in tmodel.state_dict().items()}}
    pth = tmp_path / "mini.pth"
    torch.save(ckpt, pth)

    sd = load_torch_state_dict(str(pth))
    assert "conv1.weight" in sd  # prefix stripped

    model_config = {
        "name": "resnet18",
        "bcosify_args": {"fix_b": True, "use_bias": True, "norm_layer": "BnUncV2",
                         "gap": True, "act_layer": True},
        "bcos_args": {"b": 1},
    }
    want_net, want_vars = _mini_build(model_config, tmodel)

    old = eng.RESNET_LAYERS["resnet18"]
    eng.RESNET_LAYERS["resnet18"] = ("basic", (1, 1))
    try:
        _, got_vars = eng.build_bcosified_resnet(
            model_config, sd, input_size=32, num_classes=7, inplanes=8,
        )
    finally:
        eng.RESNET_LAYERS["resnet18"] = old

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got_vars, want_vars,
    )

    out = write_npz(got_vars, tmp_path, "mini_import")
    assert out.exists() and "-" in out.stem  # sha-stamped
    loaded = dict(np.load(out))
    assert any(k.startswith("params/") for k in loaded)
    assert any(k.startswith("batch_stats/") for k in loaded)
