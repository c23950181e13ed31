"""End-to-end text-grounded localisation parity vs the torch reference.

Runs the reference's ACTUAL `compute_attributions`
(`/root/reference/interpretability/analyses/text_localisation.py:68-126`) —
explanation-mode forward, differentiable cosine normalisation, the
attn-unpool pooling variants (pool_cosine 0/1/2, norm_max_cosine), backward,
colour render, percentile-clipped raw attributions — on the calibrated
reference b=2 CLIP tower, against this framework's
`text_localisation.compute_attributions` on the imported model, for both the
pooled and attn-unpool heads.

The quantitative outputs (clipped contribution map, vrange) must match at
fp32 tolerance everywhere. The RGBA render is compared away from
contribution sign-crossings: at pixels where the contribution is ~0 the
reference's `alpha = where(contribs < 0, 1e-12, alpha)` makes the render a
sign(0±eps) function, so fp32-identical frameworks can legitimately differ
on exactly those pixels (the same instability exists between two torch runs
in different precision modes).
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import (  # noqa: E402
    load_reference_text_localisation,
    reference_available,
)

from test_e2e_clip_b2_oracle import clip_oracle  # noqa: E402,F401 (fixture)

from bcosification_tpu.interpretability.analyses.text_localisation import (  # noqa: E402
    compute_attributions,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)

CASES = {
    "default": dict(pool_cosine=1, norm_max_cosine=False, smooth=0),
    "smooth3": dict(pool_cosine=1, norm_max_cosine=False, smooth=3),
    "pow2": dict(pool_cosine=2, norm_max_cosine=False, smooth=0),
    "argmax": dict(pool_cosine=0, norm_max_cosine=False, smooth=0),
    "maxnorm": dict(pool_cosine=1, norm_max_cosine=True, smooth=0),
}


def _embedding(ref, x6, attn_unpool):
    """Unit text embedding with a strictly positive max cosine, so the
    argmax-mask case avoids the all-negative degenerate branch (where the
    reference's final max lands on a zeroed entry and the gradient vanishes
    — torch and jax then differ only in tie handling of an all-zero grad)."""
    out_dim = None
    rng = np.random.default_rng(5)
    with torch.no_grad():
        feats = ref(torch.from_numpy(x6[:1])).numpy()
    out_dim = feats.shape[-1]
    t = rng.standard_normal(out_dim).astype(np.float32)
    t /= np.linalg.norm(t)
    flat = feats.reshape(-1, out_dim)
    flat = flat / np.linalg.norm(flat, axis=-1, keepdims=True)
    if (flat @ t).max() <= 0:
        t = -t
    return t


def _stable_mask(contribs, smooth):
    """Pixels whose contribution is safely away from the sign crossing, minus
    a `smooth`-sized border around unstable ones (alpha smoothing diffuses a
    flipped pixel's alpha into its neighbourhood)."""
    c = np.asarray(contribs)
    stable = np.abs(c) > 1e-3 * np.abs(c).max()
    if smooth:
        pad = (smooth - 1) // 2
        padded = np.pad(stable, pad, mode="edge")
        for dy in range(smooth):
            for dx in range(smooth):
                h, w = stable.shape
                stable = stable & padded[dy : dy + h, dx : dx + w]
    return stable


@pytest.mark.parametrize("case", list(CASES))
def test_text_localisation_matches_reference(clip_oracle, case):  # noqa: F811
    ref, net, variables, x6, attn_unpool = clip_oracle
    cfg = CASES[case]
    if not attn_unpool and case not in ("default", "smooth3"):
        pytest.skip("pooling flags only apply to the attn-unpool head")

    t = _embedding(ref, x6, attn_unpool)
    mod = load_reference_text_localisation()

    test_img = torch.from_numpy(x6[0])  # [6, H, W]
    zeroshot_weight = torch.from_numpy(t[:, None])  # (D, 1)
    want_img, want_contribs, want_vrange = mod.compute_attributions(
        ref,
        test_img,
        zeroshot_weight,
        smooth=cfg["smooth"],
        pool_cosine=cfg["pool_cosine"],
        norm_max_cosine=cfg["norm_max_cosine"],
    )

    img_j = jnp.asarray(x6[:1].transpose(0, 2, 3, 1))
    res = compute_attributions(
        net,
        variables,
        jnp.asarray(t),
        img_j,
        pool_cosine=cfg["pool_cosine"],
        norm_max_cosine=cfg["norm_max_cosine"],
        smooth=cfg["smooth"],
    )

    got_contribs = np.asarray(res["contribution_map_clipped"])
    scale = max(np.abs(want_contribs).max(), 1e-6)
    np.testing.assert_allclose(
        got_contribs, want_contribs, rtol=1e-4, atol=1e-4 * scale
    )
    np.testing.assert_allclose(res["vrange"], want_vrange, rtol=1e-4)

    got_img = np.asarray(res["explanation"])
    assert got_img.shape == want_img.shape
    stable = _stable_mask(res["contribution_map"], cfg["smooth"])
    # the argmax head localises the gradient to one output location's
    # receptive field, so LOW coverage is expected there — the guard only
    # keeps the render comparison from being vacuous
    assert stable.sum() > 100, f"render comparison vacuous ({stable.sum()} px)"
    got_s, want_s = got_img[stable], np.asarray(want_img)[stable]
    # rgb = pos/(pos+inv) is a binary-ish ratio: where a W channel sits at ~0
    # its sign under fp32 noise flips the ratio 0<->1 for that one channel, so
    # tolerate isolated flips (<0.1% of entries) on top of fp32 closeness
    bad = np.abs(got_s - want_s) > (2e-3 + 1e-3 * np.abs(want_s))
    assert bad.mean() < 1e-3, (
        f"{bad.sum()}/{bad.size} render entries mismatch "
        f"(max |diff| {np.abs(got_s - want_s).max():.3g})"
    )


def test_argmax_maxnorm_combination_rejected():
    """The reference silently produces NaN for pool_cosine=0 +
    norm_max_cosine (text_localisation.py:85-92: the (1, HW)-shaped dim-0
    max-divide hits 0/0 on masked entries); we fail loudly instead."""
    with pytest.raises(ValueError, match="NaN"):
        compute_attributions(
            None, None, None, None, pool_cosine=0, norm_max_cosine=True
        )
