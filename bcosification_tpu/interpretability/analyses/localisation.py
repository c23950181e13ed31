"""Grid pointing game ("localisation" metric).

Parity target: `/root/reference/interpretability/analyses/localisation.py`:
sort val images by classifier confidence per class (:127-172), assemble 3x3
(or 2x2) multi-images of distinct confidently-classified classes
(`make_multi_image` :417-466, column-major cell layout), attribute each
participating class, optional stride/unfold for ViTs (:282-305), smooth,
clamp >= 0, score = fraction of positive attribution inside the correct cell
(:383-398). Saves `.np` arrays + config.log.

TPU-native: confidences in one jitted sharded eval sweep; attributions are a
single vmapped VJP per multi-image.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bcosification_tpu.interpretability.analyses.utils import Analyser
from bcosification_tpu.interpretability.explanation_methods import get_explainer

__all__ = ["LocalisationAnalyser", "make_multi_image"]


def make_multi_image(n_imgs: int, dataset, offset: int = 0, fixed_indices=None):
    """localisation.py:417-466 — channel-last. Returns (multi_img [1,sH,sW,C],
    targets, new_offset). Image i is placed at grid cell
    (row=i%s, col=i//s) (the reference's permute layout)."""
    assert n_imgs in (4, 9)
    s = int(np.sqrt(n_imgs))
    mapper = fixed_indices if fixed_indices is not None else list(range(len(dataset)))
    tgts: List[int] = []
    imgs: List[np.ndarray] = []
    i = 0
    while len(tgts) < n_imgs:
        img, tgt = dataset[mapper[i + offset]]
        i += 1
        tgt = int(tgt)
        if tgt in tgts:
            continue
        imgs.append(np.asarray(img))
        tgts.append(tgt)
    h, w, c = imgs[0].shape
    grid = np.zeros((s * h, s * w, c), imgs[0].dtype)
    for idx, im in enumerate(imgs):
        row, col = idx % s, idx // s
        grid[row * h : (row + 1) * h, col * w : (col + 1) * w] = im
    return grid[None], tgts, i + offset + 1


class LocalisationAnalyser(Analyser):
    """localisation.py:24-466."""

    default_config = dict(
        explainer_name="Ours",
        sample_size=250,
        n_imgs=9,
        conf_thresh=0.5,
        smooth=15,
        striding="none",
        do_rescale=False,
        neg=False,
        batch_size=64,
        max_imgs=None,
    )

    def __init__(self, model, variables, dataset, save_folder=".", **config):
        super().__init__(**config)
        self.model = model
        self.variables = variables
        self.dataset = dataset
        self.save_folder = Path(save_folder)

    # -- confidences (localisation.py:127-172) --------------------------------
    def compute_sorted_confs(self) -> Dict[int, List]:
        fp = self.save_folder / "confidences.pkl"
        if fp.exists():
            with fp.open("rb") as f:
                return pickle.load(f)
        fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
        # dense over ALL class ids (reference localisation.py:150: the dict is
        # prepopulated from NUM_CLASSES) — get_sorted_indices masks by class id
        confidences: Optional[Dict[int, List]] = None
        bs = self.config["batch_size"]
        n = len(self.dataset)
        for start in range(0, n, bs):
            batch = [self.dataset[i] for i in range(start, min(start + bs, n))]
            imgs = jnp.asarray(np.stack([np.asarray(b[0]) for b in batch]))
            tgts = np.asarray([int(b[1]) for b in batch])
            logits = np.asarray(fwd(self.variables, imgs))
            if confidences is None:
                confidences = {i: [] for i in range(logits.shape[-1])}
            pred = logits.argmax(-1)
            conf = logits.max(-1)
            for j in range(len(batch)):
                if pred[j] != tgts[j]:
                    continue  # wrongly classified are not used
                confidences[int(tgts[j])].append((start + j, float(conf[j])))
        if confidences is None:
            confidences = {}
        for k in confidences:
            confidences[k].sort(key=lambda t: t[1], reverse=True)
        self.save_folder.mkdir(parents=True, exist_ok=True)
        with fp.open("wb") as f:
            pickle.dump(confidences, f)
        return confidences

    def get_sorted_indices(self, confidences) -> List[int]:
        """localisation.py:174-220: blocks of n_imgs distinct confident
        classes, per-class confidence decreasing across blocks.

        Draw-for-draw identical to the reference: legacy ``np.random``
        MT19937 seeded with 42 (the reference's hard-coded
        ``np.random.seed(42)``), classes in ascending-id order, and the
        strict ``mask.sum() > n_imgs`` stopping rule — the sampled image set
        (hence the published metric) depends on this exact sequence."""
        import math

        rng = np.random.RandomState(self.config.get("seed", 42))
        n = self.config["n_imgs"]
        thresh = self.config["conf_thresh"]
        classes = np.array(sorted(int(k) for k in confidences))
        pos = {c: i for i, c in enumerate(classes)}
        pointers = {c: 0 for c in classes}
        idcs: List[int] = []

        def conf_ok(c: int) -> bool:
            v = confidences[c][pointers[c]][1]
            return thresh is None or 1.0 / (1.0 + math.exp(-v)) > thresh

        mask = np.array(
            [len(confidences[c]) > 0 and conf_ok(c) for c in classes], dtype=bool
        )
        while mask.sum() > n:
            sample = rng.choice(classes[mask], size=n, replace=False)
            for c in sample:
                c = int(c)
                idcs.append(confidences[c][pointers[c]][0])
                pointers[c] += 1
                mask[pos[c]] = (
                    conf_ok(c) if pointers[c] < len(confidences[c]) else False
                )
            if self.config["max_imgs"] and len(idcs) >= self.config["max_imgs"] * n:
                break
        return idcs

    # -- scoring ---------------------------------------------------------------
    def _score(self, attributions: np.ndarray, tgt_count: int, single_shape: int):
        """attributions [T, sH, sW] (channel-summed, clamped) -> per-target
        fraction inside its own cell (localisation.py:383-398)."""
        T, H, W = attributions.shape
        s = H // single_shape
        cells = attributions.reshape(T, s, single_shape, s, single_shape).sum((2, 4))
        # cell (row=i%s, col=i//s) belongs to target i: column-major flatten
        flat = cells.transpose(0, 2, 1).reshape(T, -1)
        total = flat.sum(1, keepdims=True)
        frac = np.where(total * flat > 0, flat / np.maximum(total, 1e-12), 0.0)
        return np.asarray([frac[i, i] for i in range(T)])

    def _strided_attributions(
        self, explainer, multi_img: np.ndarray, tgts, single_shape: int, stride: int
    ) -> np.ndarray:
        """Striding mode (localisation.py:282-305): unfold the multi-image
        into overlapping single_shape x single_shape crops (zero-padded by
        single_shape - stride on every side, like F.unfold), attribute each
        crop for all targets, fold back with overlap-sum, crop the padding.
        For fixed-input-size models (ViTs) this is the only way to attribute
        a grid larger than the model's native resolution."""
        ks = single_shape
        pad = ks - stride
        img = np.asarray(multi_img)[0]  # [sH, sW, C]
        h, w, c = img.shape
        padded = np.zeros((h + 2 * pad, w + 2 * pad, c), np.float32)
        padded[pad : pad + h, pad : pad + w] = img
        tgts_j = jnp.asarray(tgts)
        acc = np.zeros((len(tgts), h + 2 * pad, w + 2 * pad), np.float64)
        for i in range(0, h + 2 * pad - ks + 1, stride):
            for j in range(0, w + 2 * pad - ks + 1, stride):
                patch = jnp.asarray(padded[None, i : i + ks, j : j + ks])
                a = np.asarray(explainer.attribute_selection(patch, tgts_j))
                acc[:, i : i + ks, j : j + ks] += a.sum(-1)
        return acc[:, pad : pad + h, pad : pad + w].astype(np.float32)

    def analysis(self) -> Dict[str, np.ndarray]:
        from bcosification_tpu.ops.pooling import avg_pool2d

        confidences = self.compute_sorted_confs()
        fixed_indices = self.get_sorted_indices(confidences)
        n_imgs = self.config["n_imgs"]
        sample_size = self.config["sample_size"]
        explainer = get_explainer(
            self.model,
            self.variables,
            self.config["explainer_name"],
            **self.config.get("explainer_kwargs", {}),
        )
        smooth = self.config["smooth"]

        single_shape = np.asarray(self.dataset[0][0]).shape[0]
        metric: List[np.ndarray] = []
        offset = 0
        count = 0
        while count < sample_size and offset + n_imgs <= len(fixed_indices):
            multi_img, tgts, offset = make_multi_image(
                n_imgs, self.dataset, offset=offset, fixed_indices=fixed_indices
            )
            striding = str(self.config.get("striding", "none"))
            if striding != "none":
                atts = self._strided_attributions(
                    explainer, multi_img, tgts, single_shape, int(striding)
                )
            else:
                atts = explainer.attribute_selection(
                    jnp.asarray(multi_img), jnp.asarray(tgts)
                )  # [T, sH, sW, C]
                atts = np.asarray(atts).sum(-1)  # channel sum
            if smooth:
                a = jnp.asarray(atts)[..., None]
                a = avg_pool2d(a, smooth, 1, (smooth - 1) // 2)
                atts = np.asarray(a)[..., 0]
            if self.config["neg"]:
                atts = -atts
            atts = np.clip(atts, 0, None)
            metric.append(self._score(atts, len(tgts), single_shape))
            count += 1

        result = np.concatenate(metric) if metric else np.zeros(0)
        if self.config["neg"]:
            result = 1 - result
        if not len(result):
            print(
                "Localisation metric is EMPTY: no grids of "
                f"{self.config['n_imgs']} distinct confidently-CORRECTLY-"
                "classified classes could be built (reference semantics, "
                "localisation.py:127-172 — wrongly classified images are "
                "excluded). An untrained/early-epoch model typically "
                "classifies nothing correctly."
            )
        if len(result):
            print(
                f"Mean localisation metric: {result.mean():.4f} "
                f"(n={len(result)}); percentiles (25,50,75,100): "
                f"{np.percentile(result, [25, 50, 75, 100])}"
            )
        return {"localisation_metric": result}


def make_datamodule_for_config(experiment, cfg):
    """Build the eval datamodule for an analysis config, applying the
    rescale-mode transform override (reference localisation.py:256-265:
    shrink the eval transform by the grid size so the n x n multi-image has
    the model's native input resolution). Shared by the CLI and the sweep."""
    dm_overrides = {}
    if cfg.get("do_rescale"):
        prev = experiment.config["data"]["test_transform"]
        prev_args = getattr(prev, "args", {})
        if "crop_size" not in prev_args:
            raise ValueError(
                "rescale mode needs a resize/crop test transform preset "
                "(no crop_size on the experiment's test_transform)"
            )
        n = int(cfg["n_imgs"] ** 0.5)
        dm_overrides["test_transform"] = prev.with_args(
            crop_size=prev_args["crop_size"] // n,
            resize_size=prev_args.get("resize_size", 256) // n,
        )
    return experiment.get_datamodule(**dm_overrides)


def argument_parser(add_help: bool = True):
    """Reference-compatible CLI (`/root/reference/interpretability/analyses/
    localisation.py:476-541`), plus the (dataset, base_network,
    experiment_name) triple as an alternative to --save_path."""
    import argparse

    parser = argparse.ArgumentParser(
        description="Localisation analysis (grid pointing game).",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        add_help=add_help,
    )
    parser.add_argument("--save_path", default=None,
                        help="Experiment save dir (alternative to the triple).")
    parser.add_argument("--dataset", default="ImageNet")
    parser.add_argument("--base_network", default="bcosification")
    parser.add_argument("--experiment_name", default=None)
    parser.add_argument("--reload", default="last",
                        help="last | best | best_any | epoch_<N>")
    parser.add_argument("--ema", action="store_true", default=False)
    parser.add_argument("--explainer_name", default="Ours")
    parser.add_argument("--analysis_config", default="500_3x3")
    parser.add_argument("--striding", default=None,
                        help="bare stride integer, e.g. 4, or 'none' "
                             "(default: whatever the analysis_config "
                             "encodes, e.g. '..._stride=14')")
    parser.add_argument("--explainer_config", default="default",
                        help="explainer kwarg preset name from "
                             "explanation_configs ('default' keeps the "
                             "explainer's own preset)")
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--smooth", required=True, type=int,
                        help="attribution smoothing (avg_pool) kernel")
    parser.add_argument("--force_confidence_calculation", action="store_true",
                        default=False)
    parser.add_argument("--save_root", default="localisation_results")
    parser.add_argument("--debug", action="store_true", default=False)
    return parser


def main(config=None):
    from bcosification_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    from bcosification_tpu.experiments.utils import Experiment
    from bcosification_tpu.interpretability.analyses.localisation_configs import (
        configs as loc_configs,
    )
    from bcosification_tpu.interpretability.explanation_methods import (
        explanation_configs,
    )

    if config is None:
        config = argument_parser().parse_args()
    print("Starting localisation analysis for", config)

    if config.save_path:
        experiment = Experiment(path=config.save_path)
    else:
        assert config.experiment_name, "--experiment_name or --save_path required"
        experiment = Experiment(
            config.dataset, config.base_network, config.experiment_name
        )
    model, variables = experiment.load_trained_model(config.reload, ema=config.ema)

    cfg = dict(loc_configs[config.analysis_config])
    cfg.update(
        explainer_name=config.explainer_name,
        smooth=config.smooth,
        batch_size=config.batch_size,
    )
    if config.striding is not None:  # else: keep the config's encoded value
        cfg["striding"] = config.striding
    if config.explainer_config != "default":
        if config.explainer_config not in explanation_configs:
            raise ValueError(
                f"unknown --explainer_config {config.explainer_config!r}; "
                f"available: {sorted(explanation_configs)}"
            )
        cfg["explainer_kwargs"] = explanation_configs[config.explainer_config]
    dm = make_datamodule_for_config(experiment, cfg)
    dm.setup("test")
    import os as _os

    save = _os.path.join(
        config.save_root,
        config.experiment_name or _os.path.basename(str(config.save_path)),
        config.analysis_config,
        config.explainer_name,
    )
    analyser = LocalisationAnalyser(
        model, variables, dm.eval_dataset, save_folder=save, **cfg
    )
    if config.force_confidence_calculation:
        fp = analyser.save_folder / "confidences.pkl"
        if fp.exists():
            fp.unlink()
    results = analyser.run()
    analyser.save_results(results, save)
    return results


if __name__ == "__main__":
    main()
