"""Released-checkpoint import path (bcosify/release_import.py) + the
egress-gated fetch in models/pretrained.py.

The reference's entrypoints download trained `.pth` state dicts and
`load_state_dict` them (ref pretrained.py:92-127). These tests lock the flax
equivalent end-to-end without real released weights:

- every registry entrypoint constructs (abstract mode) — the structures the
  checkpoints must land in;
- for one representative per family, a REAL full-size reference model's
  state_dict converts strictly (every flax leaf found, every torch tensor
  consumed, transposes exact);
- resnet18 converts AND agrees with the torch reference forward
  (gamma-calibrated so the b=2 contraction doesn't make it vacuous);
- `load_model(..., pretrained=True)` with BCOS_ALLOW_DOWNLOAD=1 fetches a
  file:// URL, sha-verifies the torch.hub-style filename hash, converts,
  caches the npz, and returns the converted weights; a bad hash degrades to
  random init with a warning.
"""
import hashlib
import math
import sys
import warnings
from functools import partial
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from bcosification_tpu.bcosify.release_import import (
    convert_release_checkpoint,
    family_of,
)
from bcosification_tpu.models import pretrained as pretrained_lib
from bcosification_tpu.utils.init_mode import abstract_init

torch = pytest.importorskip("torch")

from reference_loader import (  # noqa: E402
    load_reference,
    load_reference_from_scratch_models,
    reference_available,
)


def _flat(variables):
    return {
        "/".join(p.key if hasattr(p, "key") else str(p) for p in path): np.asarray(
            leaf
        )
        for path, leaf in jtu.tree_flatten_with_path(variables)[0]
    }


def test_every_registry_entrypoint_constructs():
    """All 34 entrypoints build (abstract mode) — catches wiring regressions
    like factories missing required layer classes, for the L-sized models
    too (eval_shape costs trace time only)."""
    with abstract_init():
        for name in pretrained_lib.list_available():
            model, variables = pretrained_lib.load_model(name, pretrained=False)
            assert jax.tree_util.tree_leaves(variables), name
            family_of(name)  # every entrypoint belongs to a conversion family


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
class TestFamilyConversion:
    """One full-size representative per family: the reference factory's own
    state_dict must convert strictly into the registry entrypoint's tree."""

    @pytest.fixture(scope="class")
    def ref_modules(self):
        load_reference_from_scratch_models()
        mods = sys.modules["bcos.modules"]
        norms = sys.modules["bcos.modules.norms"]
        return mods, norms

    def _assert_converts(self, name, sd):
        sd = {k: v.detach().numpy() for k, v in sd.items()}
        variables = convert_release_checkpoint(name, sd)
        n_params = len(
            [k for k in sd if not k.endswith(("num_batches_tracked", "running_mean"))]
        )
        flat = _flat(variables)
        n_leaves = len(
            [k for k in flat if not k.endswith(("num_batches_tracked", "running_mean"))]
        )
        assert n_leaves == n_params, (name, n_leaves, n_params)
        return sd, flat

    def test_resnet18(self, ref_modules):
        torch.manual_seed(0)
        mod = load_reference("bcos.models.resnet")
        sd, flat = self._assert_converts("resnet18", mod.resnet18().state_dict())
        np.testing.assert_array_equal(
            flat["params/conv1/weight"], sd["conv1.linear.weight"].transpose(2, 3, 1, 0)
        )
        np.testing.assert_array_equal(
            flat["params/fc/weight"], sd["fc.linear.weight"].transpose(2, 3, 1, 0)
        )

    def test_resnet18_bnu_checkpoint_rebuilds_norm(self, ref_modules):
        """The adaptive retry: a BNU-trained checkpoint against the
        posnorm-default entrypoint lands in a BNU tree (running stats and
        all), mirroring the reference zoo's _pn/_bnu variants under one
        architecture (ref pretrained.py:616-706)."""
        _, norms = ref_modules
        torch.manual_seed(0)
        mod = load_reference("bcos.models.resnet")
        ref = mod.resnet18(norm_layer=norms.NoBias(norms.BatchNormUncentered2d))
        variables = convert_release_checkpoint(
            "resnet18", {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        )
        assert "batch_stats" in variables
        np.testing.assert_array_equal(
            np.asarray(variables["batch_stats"]["bn1"]["running_var"]),
            ref.state_dict()["bn1.running_var"].numpy(),
        )

    def test_densenet121(self, ref_modules):
        torch.manual_seed(0)
        mod = load_reference("bcos.models.densenet")
        self._assert_converts("densenet121", mod.densenet121().state_dict())

    def test_vgg11_and_bnu(self, ref_modules):
        mods, norms = ref_modules
        torch.manual_seed(0)
        mod = load_reference("bcos.models.vgg")
        self._assert_converts(
            "vgg11", mod.vgg11(conv_layer=mods.BcosConv2d).state_dict()
        )
        self._assert_converts(
            "vgg11_bnu",
            mod.vgg11_bnu(
                conv_layer=mods.BcosConv2d,
                norm_layer=norms.NoBias(norms.BatchNormUncentered2d),
            ).state_dict(),
        )

    def test_convnext_tiny(self, ref_modules):
        torch.manual_seed(0)
        mod = load_reference("bcos.models.convnext")
        self._assert_converts("convnext_tiny", mod.convnext_tiny().state_dict())

    def _bcos_vit_sd(self, factory, ref_modules):
        """State dict shaped exactly like the released B-cos ViTs:
        vit_final layer choices + BcosSequential(model, LogitLayer)
        (vit_final/model.py:30-48)."""
        mods, norms = ref_modules
        common = load_reference("bcos.modules.common")
        logit = load_reference("bcos.modules.logitlayer")
        torch.manual_seed(0)
        m = factory(
            linear_layer=partial(mods.BcosLinear, b=2, max_out=1),
            conv2d_layer=partial(mods.BcosConv2d, b=2, max_out=1),
            norm_layer=norms.NoBias(norms.DetachableLayerNorm),
            act_layer=torch.nn.Identity,
            channels=6,
            norm2d_layer=norms.NoBias(norms.DetachableGNLayerNorm2d),
        )
        return common.BcosSequential(
            m, logit.LogitLayer(logit_bias=math.log(1 / 999))
        ).state_dict()

    def test_simple_vit_ti(self, ref_modules):
        mod = load_reference("bcos.models.vit")
        sd, flat = self._assert_converts(
            "simple_vit_ti_patch16_224",
            self._bcos_vit_sd(mod.simple_vit_ti_patch16_224, ref_modules),
        )
        np.testing.assert_array_equal(
            flat["params/to_patch_embedding_linear/weight"],
            sd["0.to_patch_embedding.linear.linear.weight"].T,
        )

    def test_vitc_ti(self, ref_modules):
        mod = load_reference("bcos.models.vit")
        sd, flat = self._assert_converts(
            "vitc_ti_patch1_14", self._bcos_vit_sd(mod.vitc_ti_patch1_14, ref_modules)
        )
        np.testing.assert_array_equal(
            flat["params/conv_stem_0/weight"],
            sd["0.to_patch_embedding.conv_stem.0.linear.weight"].transpose(2, 3, 1, 0),
        )

    def test_standard_vits(self, ref_modules):
        _, norms = ref_modules
        mod = load_reference("bcos.models.vit")
        torch.manual_seed(0)
        m = mod.simple_vit_ti_patch16_224(
            linear_layer=torch.nn.Linear,
            conv2d_layer=torch.nn.Conv2d,
            norm_layer=torch.nn.LayerNorm,
            act_layer=torch.nn.GELU,
            channels=3,
        )
        self._assert_converts("standard_simple_vit_ti_patch16_224", m.state_dict())
        torch.manual_seed(0)
        m = mod.vitc_ti_patch1_14(
            linear_layer=torch.nn.Linear,
            conv2d_layer=torch.nn.Conv2d,
            norm_layer=torch.nn.LayerNorm,
            act_layer=torch.nn.GELU,
            channels=3,
            norm2d_layer=norms.DetachableGNLayerNorm2d,
        )
        self._assert_converts("standard_vitc_ti_patch1_14", m.state_dict())


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_resnet18_release_forward_parity():
    """Converted full-size resnet18 agrees with the torch reference forward
    (the exact check scripts/validate_release_weights.py runs on real
    weights). Gammas are calibrated to O(1) pre-logit signal first — a
    random b=2 net contracts to ~0 and the comparison would be vacuous
    (CLAUDE.md contraction note)."""
    load_reference_from_scratch_models()
    mod = load_reference("bcos.models.resnet")
    torch.manual_seed(0)
    ref = mod.resnet18().eval()
    probe = torch.from_numpy(
        np.random.default_rng(11).random((1, 6, 64, 64)).astype(np.float32)
    )
    with torch.no_grad():
        gammas = [p for _, p in ref.named_parameters() if p.ndim == 1]
        for _ in range(80):
            m = float((ref(probe) + math.log(999)).abs().max())
            if m > 0.05:
                break
            for p in gammas:
                p.mul_(2.0)
        assert m > 0.05, f"calibration failed, probe magnitude {m}"

    variables = convert_release_checkpoint(
        "resnet18", {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    with abstract_init():
        net, _ = pretrained_lib.load_model("resnet18", pretrained=False)

    rng = np.random.default_rng(2)
    x = rng.random((2, 6, 64, 64)).astype(np.float32)
    x[:, 3:] = 1.0 - x[:, :3]  # AddInverse-consistent encoding
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = max(np.abs(want + math.log(999)).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
class TestFetchPath:
    """BCOS_ALLOW_DOWNLOAD=1 fetch → sha verify → convert → npz cache
    (ref pretrained.py:120-125 consumes the URL via torch.hub with
    check_hash=True)."""

    @pytest.fixture()
    def release_pth(self, tmp_path):
        load_reference_from_scratch_models()
        mod = load_reference("bcos.models.resnet")
        torch.manual_seed(0)
        ref = mod.resnet18()
        raw = tmp_path / "raw.pth"
        torch.save(ref.state_dict(), raw)
        sha = hashlib.sha256(raw.read_bytes()).hexdigest()
        pth = tmp_path / f"resnet_18-{sha[:10]}.pth"
        raw.rename(pth)
        return ref, pth

    def test_fetch_convert_cache(self, release_pth, tmp_path, monkeypatch):
        ref, pth = release_pth
        monkeypatch.setenv("BCOS_WEIGHTS_DIR", str(tmp_path / "weights"))
        monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
        monkeypatch.setattr(
            pretrained_lib, "pretrained_url", lambda name: f"file://{pth}"
        )
        _, variables = pretrained_lib.load_model("resnet18", pretrained=True)
        flat = _flat(variables)
        np.testing.assert_array_equal(
            flat["params/conv1/weight"],
            ref.state_dict()["conv1.linear.weight"].numpy().transpose(2, 3, 1, 0),
        )
        npz = Path(tmp_path / "weights" / "resnet18.npz")
        assert npz.exists()

        # second load resolves from the npz cache — no fetch
        def boom(*a, **k):
            raise AssertionError("fetch ran despite a cached npz")

        monkeypatch.setattr(pretrained_lib, "fetch_checkpoint", boom)
        _, again = pretrained_lib.load_model("resnet18", pretrained=True)
        np.testing.assert_array_equal(
            _flat(again)["params/conv1/weight"], flat["params/conv1/weight"]
        )

    def test_bad_hash_degrades_to_random_init(self, release_pth, tmp_path, monkeypatch):
        _, pth = release_pth
        bad = pth.with_name("resnet_18-" + "0" * 10 + ".pth")
        bad.write_bytes(pth.read_bytes())
        monkeypatch.setenv("BCOS_WEIGHTS_DIR", str(tmp_path / "weights2"))
        monkeypatch.setenv("BCOS_ALLOW_DOWNLOAD", "1")
        monkeypatch.setattr(
            pretrained_lib, "pretrained_url", lambda name: f"file://{bad}"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pretrained_lib.load_model("resnet18", pretrained=True)
        messages = "".join(str(w.message) for w in caught)
        assert "sha256 mismatch" in messages
        assert not (tmp_path / "weights2" / "resnet18.npz").exists()

    def test_gate_off_means_no_fetch(self, tmp_path, monkeypatch):
        monkeypatch.setenv("BCOS_WEIGHTS_DIR", str(tmp_path / "w3"))
        monkeypatch.delenv("BCOS_ALLOW_DOWNLOAD", raising=False)

        def boom(*a, **k):
            raise AssertionError("fetch ran without BCOS_ALLOW_DOWNLOAD=1")

        monkeypatch.setattr(pretrained_lib, "fetch_checkpoint", boom)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            pretrained_lib.load_model("resnet18", pretrained=True)
        assert any("random init" in str(w.message) for w in caught)
