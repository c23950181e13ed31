#!/usr/bin/env python
"""Sweep the localisation analysis over explainers x configs.

Parity target: `/root/reference/interpretability/analyses/
localisation_submitit.py` (SLURM sweep) — on TPU the sweep runs sequentially
on one chip (or shard configs across pod hosts via RANK/WORLD_SIZE).
"""
import argparse
import os


def main():
    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # BCOS_PLATFORM={cpu,tpu,auto} honoured (CLAUDE.md)
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument("--reload", default="best_any")
    parser.add_argument(
        "--explainers", nargs="+",
        default=["Ours", "IxG", "Grad", "IntGrad"],
    )
    parser.add_argument("--analysis_configs", nargs="+", default=["250_3x3"])
    parser.add_argument("--save_root", default="localisation_results")
    args = parser.parse_args()

    from bcosification_tpu.experiments.utils import Experiment
    from bcosification_tpu.interpretability.analyses.localisation import (
        LocalisationAnalyser,
    )
    from bcosification_tpu.interpretability.analyses.localisation_configs import (
        configs as loc_configs,
    )

    experiment = Experiment(args.dataset, args.base_network, args.experiment_name)
    model, variables = experiment.load_trained_model(args.reload)

    runs = [(e, c) for e in args.explainers for c in args.analysis_configs]
    rank = int(os.environ.get("RANK", 0))
    world = int(os.environ.get("WORLD_SIZE", 1))
    from bcosification_tpu.interpretability.analyses.localisation import (
        make_datamodule_for_config,
    )

    for explainer, cfg_name in runs[rank::world]:
        cfg = loc_configs[cfg_name]
        try:
            dm = make_datamodule_for_config(experiment, cfg)
        except ValueError as e:  # rescale without a crop preset
            print(f"skip {cfg_name}: {e}")
            continue
        dm.setup("test")
        save = os.path.join(
            args.save_root, args.experiment_name, cfg_name, explainer
        )
        analyser = LocalisationAnalyser(
            model, variables, dm.eval_dataset, save_folder=save,
            explainer_name=explainer, **cfg,
        )
        results = analyser.run()
        analyser.save_results(results, save)


if __name__ == "__main__":
    main()
