"""Attribution methods.

Parity target: `/root/reference/interpretability/explanation_methods/`:
the captum-backed explainers (IxG, Grad, IntGrad, GradCam — `explainers/
captum.py`), `Ours`/`OursRelative` (`explainers/ours.py`), and the black-box
baselines Occlusion / RISE / Lime (`explainers/{occlusion,rise,lime}.py`).

JAX-native design: every explainer closes over (model, variables) and exposes
    attribute(img [1,H,W,C], target) -> [1,H,W,C]
    attribute_selection(img [1,H,W,C], targets [T]) -> [T,H,W,C]
Gradient methods are single fused VJPs (vmapped over targets); the black-box
methods batch their perturbations through one jitted forward — embarrassingly
parallel on the MXU instead of the reference's sequential python loops.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ExplainerBase",
    "Ours",
    "OursRelative",
    "IxG",
    "Grad",
    "GB",
    "DeepLift",
    "IntGrad",
    "GradCam",
    "Occlusion",
    "Rise",
    "Lime",
]


class ExplainerBase:
    """Common attribute/attribute_selection adapter
    (`explanation_methods/utils.py:37-99`)."""

    explanation_mode = False  # explain=True forward (detached dyn weights)

    def __init__(self, model, variables, **config):
        self.model = model
        self.variables = variables
        self.config = config

    def _apply(self, x, explain: Optional[bool] = None):
        explain = self.explanation_mode if explain is None else explain
        return self.model.apply(self.variables, x, train=False, explain=explain)

    def attribute(self, img, target):
        return self.attribute_selection(img, jnp.asarray([target]))[0:1]

    def attribute_selection(self, img, targets):
        raise NotImplementedError


def _grad_wrt_input(apply_fn, img, targets):
    """[T,H,W,C] gradients of logits[target] wrt the (batch-1) input."""

    def one(t):
        def f(x):
            return apply_fn(x)[0, t]

        return jax.grad(f)(img)[0]

    return jax.vmap(one)(jnp.asarray(targets))


class Ours(ExplainerBase):
    """The model's own dynamic-linear contributions: IxG with detached
    dynamic weights (`explainers/ours.py` + common.py:280-344)."""

    explanation_mode = True

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(variables, img, targets):
            apply_fn = lambda x: self.model.apply(
                variables, x, train=False, explain=True
            )
            grads = _grad_wrt_input(apply_fn, img, targets)
            return grads * img[0]

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets))


class OursRelative(ExplainerBase):
    """IxG on mean-corrected logits in explanation mode
    (`explainers/ours.py` OursRelative)."""

    explanation_mode = True

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(variables, img, targets):
            def apply_fn(x):
                out = self.model.apply(variables, x, train=False, explain=True)
                return out - out.mean(axis=-1, keepdims=True)

            grads = _grad_wrt_input(apply_fn, img, targets)
            return grads * img[0]

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets))


class IxG(ExplainerBase):
    """Input x Gradient in the normal (non-detached) forward."""

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(variables, img, targets):
            apply_fn = lambda x: self.model.apply(
                variables, x, train=False, explain=False
            )
            return _grad_wrt_input(apply_fn, img, targets) * img[0]

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets))


class Grad(ExplainerBase):
    """Saliency (raw gradients)."""

    @functools.cached_property
    def _jitted(self):
        @jax.jit
        def run(variables, img, targets):
            apply_fn = lambda x: self.model.apply(
                variables, x, train=False, explain=False
            )
            return _grad_wrt_input(apply_fn, img, targets)

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets))


class GB(ExplainerBase):
    """Guided Backprop (`explainers/captum.py` GuidedBackprop): saliency
    where every ReLU's backward pass keeps only positive gradients at
    positively activated units. Differs from Grad on bcosified CNNs, which
    keep their ReLUs (``act_layer: True``, ref bcosify.py:110-114); on a
    ReLU-free B-cos net GB == Grad exactly. The context manager is entered
    inside the traced function so the guided VJP is baked into every trace
    of this explainer and no other (see ops/guided.py)."""

    @functools.cached_property
    def _jitted(self):
        from bcosification_tpu.ops.guided import guided_backprop

        @jax.jit
        def run(variables, img, targets):
            def apply_fn(x):
                with guided_backprop():
                    return self.model.apply(
                        variables, x, train=False, explain=False
                    )

            return _grad_wrt_input(apply_fn, img, targets)

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets))


class DeepLift(ExplainerBase):
    """DeepLIFT, Rescale rule (native — the reference only ships this
    captum-gated: `explainers/__init__.py:62-85`).

    Paired forward over ``concat([x, baseline])`` with every ReLU
    backpropagating the rescale multiplier (relu(x)-relu(x0))/(x-x0)
    (ops/guided.py::deeplift); attributions are (x - baseline) * grad.
    Non-ReLU nonlinearities (the b=2 dynamic scales outside explanation
    mode, GELUs) fall back to their ordinary gradients, exactly like
    captum's Rescale on unrecognised modules. With ``explanation_mode=True``
    every remaining op is linear, so summation-to-delta is exact:
    sum(attr) == f(x) - f(baseline) (tested). Default baseline: zeros.
    With a zero baseline on a bias-free ReLU net the rescale multiplier
    equals the ReLU gradient, so DeepLIFT == IxG there (also tested)."""

    def __init__(
        self, model, variables, baseline=None, explanation_mode=None, **config
    ):
        super().__init__(model, variables, **config)
        self.baseline = baseline
        if explanation_mode is not None:
            self.explanation_mode = explanation_mode

    @functools.cached_property
    def _jitted(self):
        from bcosification_tpu.ops.guided import deeplift

        explain = self.explanation_mode

        @jax.jit
        def run(variables, img, baseline, targets):
            def one(t):
                def f(pair):
                    with deeplift():
                        out = self.model.apply(
                            variables, pair, train=False, explain=explain
                        )
                    return out[0, t]

                pair = jnp.concatenate([img, baseline], axis=0)
                return jax.grad(f)(pair)[0]

            grads = jax.vmap(one)(jnp.asarray(targets))
            return grads * (img - baseline)[0]

        return run

    def attribute_selection(self, img, targets):
        baseline = (
            jnp.zeros_like(img) if self.baseline is None else
            jnp.broadcast_to(jnp.asarray(self.baseline, img.dtype), img.shape)
        )
        return self._jitted(self.variables, img, baseline, jnp.asarray(targets))


class IntGrad(ExplainerBase):
    """Integrated gradients (zero baseline), n_steps Riemann sum."""

    def __init__(self, model, variables, n_steps: int = 20, **config):
        super().__init__(model, variables, **config)
        self.n_steps = n_steps

    @functools.cached_property
    def _jitted(self):
        @functools.partial(jax.jit, static_argnums=(3,))
        def run(variables, img, targets, n_steps):
            apply_fn = lambda x: self.model.apply(
                variables, x, train=False, explain=False
            )
            alphas = (jnp.arange(n_steps) + 0.5) / n_steps

            def grad_at(alpha):
                return _grad_wrt_input(apply_fn, img * alpha, targets)

            grads = jax.lax.map(grad_at, alphas)  # [S,T,H,W,C]
            return grads.mean(0) * img[0]

        return run

    def attribute_selection(self, img, targets):
        return self._jitted(self.variables, img, jnp.asarray(targets), self.n_steps)


class GradCam(ExplainerBase):
    """GradCam for classifier-before-GAP models (`explainers/captum.py:42-75`):
    the model must expose features/classifier split via
    `model.apply(..., method='forward_features')`-style call or a
    feature_fn/classifier_fn pair passed in config."""

    def __init__(self, model, variables, feature_fn=None, classifier_fn=None, **config):
        super().__init__(model, variables, **config)
        self.feature_fn = feature_fn
        self.classifier_fn = classifier_fn

    def attribute_selection(self, img, targets):
        assert self.feature_fn is not None and self.classifier_fn is not None, (
            "GradCam needs feature_fn(x)->fmap and classifier_fn(fmap)->logits-"
            "per-location (the classifier-before-GAP split, resnet.py:452-472)"
        )
        fmap = self.feature_fn(img)  # [1,h,w,c]

        def one(t):
            def f(fm):
                logits = self.classifier_fn(fm)  # [1,h,w,num_classes]
                return logits[..., t].mean()

            g = jax.grad(f)(fmap)  # [1,h,w,c]
            weights = g.mean(axis=(1, 2), keepdims=True)
            cam = jax.nn.relu((weights * fmap).sum(-1))  # [1,h,w]
            return cam[0]

        cams = jax.vmap(one)(jnp.asarray(targets))  # [T,h,w]
        # upsample to input resolution, broadcast to channels for the common
        # [T,H,W,C] interface
        H, W, C = img.shape[1:]
        cams = jax.image.resize(cams, (cams.shape[0], H, W), "bilinear")
        return cams[..., None] / C * jnp.ones((1, 1, 1, C))


class Occlusion(ExplainerBase):
    """Sliding-window occlusion (`explainers/occlusion.py`), batched."""

    def __init__(self, model, variables, patch_size: int = 16, stride: Optional[int] = None, batch: int = 64, **config):
        super().__init__(model, variables, **config)
        self.patch_size = patch_size
        self.stride = stride or patch_size
        self.batch = batch

    def attribute_selection(self, img, targets):
        H, W, C = img.shape[1:]
        ps, st = self.patch_size, self.stride
        ys = list(range(0, H - ps + 1, st))
        xs = list(range(0, W - ps + 1, st))
        base = np.asarray(self._apply(img))[0]
        occluded = []
        for y in ys:
            for x in xs:
                o = np.array(img[0])
                o[y : y + ps, x : x + ps, :] = 0.0
                occluded.append(o)
        occluded = jnp.asarray(np.stack(occluded))
        outs = []
        fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
        for i in range(0, len(occluded), self.batch):
            outs.append(np.asarray(fwd(self.variables, occluded[i : i + self.batch])))
        outs = np.concatenate(outs)  # [n_windows, classes]
        atts = []
        for t in np.asarray(targets):
            drop = base[t] - outs[:, t]  # positive = important
            amap = np.zeros((H, W), np.float32)
            counts = np.zeros((H, W), np.float32)
            k = 0
            for y in ys:
                for x in xs:
                    amap[y : y + ps, x : x + ps] += drop[k]
                    counts[y : y + ps, x : x + ps] += 1
                    k += 1
            amap = amap / np.maximum(counts, 1)
            atts.append(np.repeat(amap[..., None] / C, C, axis=-1))
        return jnp.asarray(np.stack(atts))


class Rise(ExplainerBase):
    """RISE random-mask attribution (`explainers/rise.py`), batched."""

    def __init__(self, model, variables, n_masks: int = 500, cell_size: int = 7, p: float = 0.5, batch: int = 64, seed: int = 0, **config):
        super().__init__(model, variables, **config)
        self.n_masks = n_masks
        self.cell_size = cell_size
        self.p = p
        self.batch = batch
        self.seed = seed

    def _masks(self, H, W):
        rng = np.random.default_rng(self.seed)
        s = self.cell_size
        grid = (rng.random((self.n_masks, s, s)) < self.p).astype(np.float32)
        ch, cw = int(np.ceil(H / s)), int(np.ceil(W / s))
        # reference semantics (ref rise.py:40-54): BILINEAR upsample of the
        # s x s grid to (s+1)*cell so a random [0, cell) offset can phase-
        # shift across a full cell, then crop HxW. Smooth masks are part of
        # RISE's design; the old kron used (2*cell)-period hard blocks, so
        # only ~half the grid covered the image and the offset spanned only
        # half a cell (r5 review).
        up_h, up_w = (s + 1) * ch, (s + 1) * cw
        up = np.asarray(
            jax.image.resize(
                jnp.asarray(grid), (self.n_masks, up_h, up_w), "linear"
            ),
            np.float32,
        )
        masks = np.zeros((self.n_masks, H, W), np.float32)
        for i in range(self.n_masks):
            oy, ox = rng.integers(0, ch), rng.integers(0, cw)
            masks[i] = up[i, oy : oy + H, ox : ox + W]
        return masks

    def attribute_selection(self, img, targets):
        H, W, C = img.shape[1:]
        masks = self._masks(H, W)
        fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
        outs = []
        for i in range(0, self.n_masks, self.batch):
            m = jnp.asarray(masks[i : i + self.batch])[..., None]
            outs.append(np.asarray(fwd(self.variables, img * m)))
        outs = np.concatenate(outs)  # [n_masks, classes]
        atts = []
        for t in np.asarray(targets):
            amap = (outs[:, t][:, None, None] * masks).mean(0) / self.p
            atts.append(np.repeat(amap[..., None] / C, C, axis=-1))
        return jnp.asarray(np.stack(atts, dtype=np.float32))


class Lime(ExplainerBase):
    """LIME over superpixel-style square segments (`explainers/lime.py`):
    linear surrogate fit on random segment on/off perturbations. Handles the
    6-channel B-cos inputs natively (the reference needs a patch,
    lime.py:41-60)."""

    def __init__(self, model, variables, n_samples: int = 200, cell_size: int = 8, batch: int = 64, seed: int = 0, **config):
        super().__init__(model, variables, **config)
        self.n_samples = n_samples
        self.cell_size = cell_size
        self.batch = batch
        self.seed = seed

    def attribute_selection(self, img, targets):
        H, W, C = img.shape[1:]
        s = self.cell_size
        gh, gw = int(np.ceil(H / s)), int(np.ceil(W / s))
        n_seg = gh * gw
        rng = np.random.default_rng(self.seed)
        Z = rng.integers(0, 2, (self.n_samples, n_seg)).astype(np.float32)
        Z[0] = 1.0  # include the full image
        seg_map = np.arange(n_seg).reshape(gh, gw)
        seg_map = np.kron(seg_map, np.ones((s, s), int))[:H, :W]

        fwd = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
        outs = []
        for i in range(0, self.n_samples, self.batch):
            m = Z[i : i + self.batch][:, seg_map]  # [b,H,W]
            outs.append(
                np.asarray(fwd(self.variables, img * jnp.asarray(m)[..., None]))
            )
        outs = np.concatenate(outs)  # [n_samples, classes]

        # weighted ridge regression (cosine kernel on fraction kept)
        frac = Z.mean(1)
        w = np.exp(-((1 - frac) ** 2) / 0.25)
        ZW = Z * w[:, None]
        A = ZW.T @ Z + 1e-3 * np.eye(n_seg)
        atts = []
        for t in np.asarray(targets):
            beta = np.linalg.solve(A, ZW.T @ outs[:, t])
            amap = beta[seg_map].astype(np.float32)
            atts.append(np.repeat(amap[..., None] / C, C, axis=-1))
        return jnp.asarray(np.stack(atts))
