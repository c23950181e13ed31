"""Combinatorial localisation config grid.

Parity target: `/root/reference/interpretability/analyses/
localisation_configs.py:1-21`: names encode the grid
`{sample_size}_{n x n}[_rescale][_noconfthresh][-stride=S][-neg]`, built over
sample sizes (500, 250, 50), grid sizes (2, 3), rescale on/off, confidence
threshold 0.5 vs 0 ("noconfthresh"), strides (none, 4, 14, 28, 56, 112) and
sign flip. smooth=15 everywhere (reference Analyser default).
"""
from __future__ import annotations

configs = {
    (
        f"{sample_size}_{n}x{n}{rescale_sfx}{conf_sfx}{stride_sfx}{neg_sfx}"
    ): dict(
        sample_size=sample_size,
        n_imgs=n * n,
        do_rescale=do_rescale,
        conf_thresh=conf_thresh,
        striding=striding,
        neg=neg,
        smooth=15,
    )
    for sample_size in (500, 250, 50)
    for n in (2, 3)
    for rescale_sfx, do_rescale in (("_rescale", True), ("", False))
    for conf_sfx, conf_thresh in (("_noconfthresh", 0.0), ("", 0.5))
    for stride_sfx, striding in (
        ("", "none"),
        *((f"-stride={s}", str(s)) for s in (4, 14, 28, 56, 112)),
    )
    for neg_sfx, neg in (("", False), ("-neg", True))
}
