"""Combinatorial localisation config grid.

Parity target: `/root/reference/interpretability/analyses/
localisation_configs.py:1-21`: names encode the grid
`{sample_size}_{n x n}[_rescale][_noconfthresh][-stride=S][-neg]`.
"""
from __future__ import annotations

configs = {}
for sample_size in (250, 500):
    for n in (2, 3):
        for conf in (True, False):
            for neg in (False, True):
                name = f"{sample_size}_{n}x{n}"
                if not conf:
                    name += "_noconfthresh"
                if neg:
                    name += "-neg"
                configs[name] = dict(
                    sample_size=sample_size,
                    n_imgs=n * n,
                    conf_thresh=0.5 if conf else None,
                    neg=neg,
                    smooth=15,
                    striding="none",
                )
for stride in (16,):
    configs[f"250_3x3-stride={stride}"] = dict(
        sample_size=250, n_imgs=9, conf_thresh=0.5, neg=False, smooth=15,
        striding=str(stride),
    )
