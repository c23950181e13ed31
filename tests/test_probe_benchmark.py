"""probe_benchmark sweep drivers (ref CLIP_benchmark/probe_benchmark/).

The drivers are thin runners over cli.run; these tests lock the grid shape
(the reference's exact point count and skip rules), the argument wiring and
resume-on-existing behaviour, and the pandas post-processing that turns the
sweep outputs into the scaling dataframe / VTAB average / LaTeX table."""
import json
import os

import numpy as np
import pytest

from clip_benchmark.probe_benchmark import (
    build_df_scaling_experiments as build_df,
    common,
    generate_table,
    laion5b_fewshot_experiments as laion5b,
    process_vtab,
    scaling_experiments as scaling,
)


def test_scaling_grid_matches_reference_count(tmp_path):
    # ref scaling_experiments.py:1-79: 13 models x 3 epochs x 3 lrs x 1 bs
    # x (2 non-vtab datasets x 3 ks + 19 vtab x 2 ks  — k>=25 skipped on vtab)
    outs = scaling.main(["--dry_run", "--data_dir", str(tmp_path)])
    assert len(outs) == 13 * 3 * 3 * (2 * 3 + 19 * 2) == 5148
    assert len(set(outs)) == len(outs)
    # the reference's output naming (scaling_experiments.py:66: '/'->'_')
    assert not any("/" in os.path.basename(o) for o in outs)


def test_laion5b_grid_matches_reference_count(tmp_path):
    # ref laion5b_fewshot_experiments.py: 9 models x 8 ks x 4 lrs x 4 epochs
    outs = laion5b.main(["--dry_run", "--data_dir", str(tmp_path)])
    assert len(outs) == 9 * 8 * 4 * 4 == 1152


def test_run_probe_grid_wires_args_and_resumes(tmp_path, monkeypatch):
    calls = []

    def fake_run(args):
        calls.append(args)
        with open(args.output, "w") as f:
            json.dump({"metrics": {"lp_acc1": 0.5, "fewshot_k": args.fewshot_k}}, f)

    monkeypatch.setattr(common.cli, "run", fake_run)
    kwargs = dict(
        models=["RN50,openai"],
        datasets=["dummy"],
        ks=[1, -1],
        lrs=[0.1],
        epoch_vals=[2],
        batch_sizes=[8],
        data_dir=str(tmp_path),
        dataset_root_fn=lambda d: "root",
        skip_load=True,
        feature_root=str(tmp_path / "feat"),
    )
    outs = common.run_probe_grid(**kwargs)
    assert len(outs) == len(calls) == 2
    a = calls[0]
    # wiring: every grid knob lands on the cli args namespace
    assert a.task == "linear_probe"
    assert (a.model, a.pretrained) == ("RN50", "openai")
    assert a.fewshot_epochs == 2 and a.fewshot_lr == 0.1 and a.batch_size == 8
    assert a.skip_load is True and a.feature_root == str(tmp_path / "feat")
    assert {c.fewshot_k for c in calls} == {1, -1}
    # defaults come from the real parser, not a drifting copy
    assert a.amp is True and a.language == ["en"]
    # resume: existing outputs are skipped (ref scaling_experiments.py:66-69)
    calls.clear()
    outs2 = common.run_probe_grid(**kwargs)
    assert outs2 == [] and calls == []


def test_eval_args_rejects_unknown_keys():
    with pytest.raises(AttributeError):
        common.eval_args(no_such_flag=1)


def _synthetic_sweep(tmp_path, monkeypatch):
    """Tiny grid + output JSONs in the reference's layout."""
    monkeypatch.setattr(scaling, "EPOCH_VALS", [10])
    monkeypatch.setattr(scaling, "KS", [10, -1])
    monkeypatch.setattr(scaling, "LRS", [0.1])
    models = ["ViT-B-32,openai", "ViT-B-32,laion2b_s34b_b79k"]
    datasets = scaling.DATASETS
    rng = np.random.default_rng(0)
    for dataset in datasets:
        for model_info in models:
            model, pretrained = model_info.split(",")
            for k in scaling.KS:
                if k >= 25 and dataset.startswith("vtab"):
                    continue
                pth = os.path.join(
                    str(tmp_path),
                    f"{model}-{pretrained}-{dataset}-10-{k}-0.1-256.json".replace("/", "_"),
                )
                with open(pth, "w") as f:
                    json.dump(
                        {"metrics": {"lp_acc1": float(rng.uniform(0.2, 0.9)),
                                     "fewshot_k": k}},
                        f,
                    )
    return models, datasets


def test_build_df_vtab_and_table(tmp_path, monkeypatch):
    pd = pytest.importorskip("pandas")
    models, datasets = _synthetic_sweep(tmp_path, monkeypatch)

    rows = build_df.build_rows(str(tmp_path), models=models, datasets=datasets)
    # 2 models x (2 headline x 2 ks + 19 vtab x 1 k) — vtab keeps only k=10? no:
    # k>=25 skip keeps {10, -1} on vtab too with this tiny grid
    assert len(rows) == 2 * (2 * 2 + 19 * 2)
    df = pd.DataFrame(rows)
    assert {"lp_acc1", "fewshot_k", "dataset", "model", "pretrained",
            "upstream_dataset"} <= set(df.columns)
    assert set(df.upstream_dataset) == {"CLIP-WIT", "LAION-2B"}

    # process_vtab: one synthetic 'vtab' row per model, mean of per-set bests
    vrows = process_vtab.vtab_rows(df)
    assert len(vrows) == 2
    g = df[(df.model == "ViT-B-32") & (df.pretrained == "openai")
           & (df.fewshot_k == -1)]
    want = np.mean(
        [g[g.dataset == d].lp_acc1.max() for d in scaling.VTAB_DATASETS]
    )
    got = [r for r in vrows if r["pretrained"] == "openai"][0]["lp_acc1"]
    assert abs(got - want) < 1e-12

    # generate_table: VTAB average + per-shot headline columns, LaTeX-able
    table, cols = generate_table.build_table(df)
    assert "VTAB acc" in cols
    assert "imagenet1k-unverified: 10 shot" in cols
    assert len(table) == 2
    latex = table.to_latex(columns=["model"] + cols)
    assert "VTAB acc" in latex


def test_build_df_strict_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        build_df.build_rows(str(tmp_path), models=["ViT-B-32,openai"],
                            datasets=["cifar100"])
    assert build_df.build_rows(str(tmp_path), models=["ViT-B-32,openai"],
                               datasets=["cifar100"], strict=False) == []
