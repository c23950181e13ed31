"""Config-grid parity vs the reference experiment system.

The reference builds its experiment grids combinatorially in
`bcos/experiments/<dataset>/<base_network>/experiment_parameters.py::CONFIGS`
(SURVEY §2.6). These tests import the reference grids directly (via the
stub loader) and assert the new framework reproduces

- every config NAME in every (dataset, base_network) directory, and
- the headline hyperparameters per shared config: batch size, max epochs,
  criterion / test-criterion class, optimizer family + lr, LR-schedule name.

Name grids are compared exhaustively (including the 4128-entry
vit_bcosification grid); extras on our side are allowed only for
ImageNet/clip_bcosification, where the ViT-tower and attn-unpool CLIP
variants are deliberate framework additions.
"""
import importlib

import pytest

from reference_loader import load_reference_experiment_configs, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

DIRS = [
    ("ImageNet", "bcosification"),
    ("ImageNet", "vit_bcosification"),
    ("ImageNet", "clip_bcosification"),
    ("ImageNet", "vit_final"),
    ("CC3M", "clip_bcosification"),
]

# Our clip_bcosification grid is a strict superset (ViT towers, attn-unpool
# variants); everywhere else the name sets must be identical.
SUPERSET_OK = {("ImageNet", "clip_bcosification")}


def _ours(dataset, base_network):
    mod = importlib.import_module(
        f"bcosification_tpu.experiments.{dataset}.{base_network}.experiment_parameters"
    )
    return mod.CONFIGS


@pytest.mark.parametrize("dataset,base_network", DIRS)
def test_config_names_match_reference(dataset, base_network):
    ref = load_reference_experiment_configs(dataset, base_network)
    ours = _ours(dataset, base_network)
    missing = sorted(set(ref) - set(ours))
    assert not missing, f"configs missing vs reference: {missing[:10]}"
    if (dataset, base_network) not in SUPERSET_OK:
        extra = sorted(set(ours) - set(ref))
        assert not extra, f"unexpected extra configs: {extra[:10]}"


@pytest.mark.parametrize("dataset,base_network", DIRS)
def test_config_hyperparameters_match_reference(dataset, base_network):
    ref = load_reference_experiment_configs(dataset, base_network)
    ours = _ours(dataset, base_network)
    diffs = []
    for name in sorted(set(ref) & set(ours)):
        r, o = ref[name], ours[name]
        checks = [
            ("batch_size", r["data"].get("batch_size"), o["data"].get("batch_size")),
            (
                "max_epochs",
                r.get("trainer", {}).get("max_epochs"),
                o.get("trainer", {}).get("max_epochs"),
            ),
            (
                "criterion",
                type(r.get("criterion")).__name__,
                type(o.get("criterion")).__name__,
            ),
            (
                "test_criterion",
                type(r.get("test_criterion")).__name__,
                type(o.get("test_criterion")).__name__,
            ),
            ("use_agc", r.get("use_agc"), o.get("use_agc")),
            (
                "gradient_clip_val",
                r.get("trainer", {}).get("gradient_clip_val"),
                o.get("trainer", {}).get("gradient_clip_val"),
            ),
        ]
        ro, oo = r.get("optimizer"), o.get("optimizer")
        if ro is not None or oo is not None:
            checks.append(
                (
                    "optimizer",
                    (
                        getattr(ro, "name", None),
                        getattr(ro, "args", {}).get("lr"),
                        getattr(ro, "args", {}).get("weight_decay"),
                    ),
                    (
                        getattr(oo, "name", None),
                        getattr(oo, "args", {}).get("lr"),
                        getattr(oo, "args", {}).get("weight_decay"),
                    ),
                )
            )
        rs, os_ = r.get("lr_scheduler"), o.get("lr_scheduler")
        checks.append(
            ("lr_schedule", getattr(rs, "name", None), getattr(os_, "name", None))
        )
        for field, rv, ov in checks:
            if rv != ov:
                diffs.append((name, field, rv, ov))
    assert not diffs, f"{len(diffs)} hyperparameter diffs, first 10: {diffs[:10]}"
