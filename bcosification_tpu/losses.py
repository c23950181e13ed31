"""Losses, including the distributed contrastive losses.

Parity target: `/root/reference/bcos/modules/losses.py`. The torch.distributed
machinery maps onto JAX named-axis collectives:

- `gather_features` (NCCL all_gather w/ grad, losses.py:288-332)
  -> `jax.lax.all_gather(..., axis_name, tiled=True)` whose VJP is the
  gradient-preserving reduce-scatter (== torch.distributed.nn.all_gather).
- `NeighbourExchange`/`NeighbourExchangeBidir` (P2P isend/irecv ring,
  losses.py:488-573) -> `jax.lax.ppermute` over the ICI ring; ppermute's VJP is
  the inverse permutation, which is exactly `NeighbourExchange.backward`
  (losses.py:549-551).

All losses are pure callables (configured via dataclass fields, mirroring the
reference's nn.Module constructor args) operating on the *local shard* inside
`shard_map`/`pjit`; pass ``axis_name`` to enable the cross-device paths.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "binary_cross_entropy_with_logits",
    "cross_entropy",
    "BinaryCrossEntropyLoss",
    "CrossEntropyLoss",
    "UniformOffLabelsBCEWithLogitsLoss",
    "InfoNCELoss",
    "info_nce",
    "gather_features",
    "ClipLoss",
    "CoCaLoss",
    "DistillClipLoss",
    "neighbour_exchange",
    "neighbour_exchange_bidir",
    "SigLipLoss",
]


def _one_hot_if_needed(x, target):
    if target.shape != x.shape:
        target = jax.nn.one_hot(target, x.shape[-1], dtype=x.dtype)
    return target.astype(x.dtype)


def binary_cross_entropy_with_logits(
    x: jax.Array,
    target: jax.Array,
    weight: Optional[jax.Array] = None,
    pos_weight: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Numerically-stable BCE-with-logits matching
    torch.nn.functional.binary_cross_entropy_with_logits."""
    # -[t * log sig(x) + (1-t) * log sig(-x)], with optional pos_weight on t
    log_sig_x = -jax.nn.softplus(-x)
    log_sig_neg_x = -jax.nn.softplus(x)
    if pos_weight is not None:
        loss = -(pos_weight * target * log_sig_x + (1 - target) * log_sig_neg_x)
    else:
        loss = -(target * log_sig_x + (1 - target) * log_sig_neg_x)
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    reduction: str = "mean",
    ignore_index: Optional[int] = None,
) -> jax.Array:
    """CE with integer labels over the last axis (torch F.cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        mask = (labels != ignore_index).astype(nll.dtype)
        nll = nll * mask
        if reduction == "mean":
            return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    return nll


@dataclasses.dataclass(frozen=True)
class BinaryCrossEntropyLoss:
    """BCE test/train criterion with one-hot conversion, smoothing and
    thresholding (losses.py:35-96)."""

    smoothing: float = 0.0
    target_threshold: Optional[float] = None
    reduction: str = "mean"

    def __call__(self, x, target):
        assert x.shape[0] == target.shape[0]
        num_classes = x.shape[-1]
        target = _one_hot_if_needed(x, target)
        if self.smoothing > 0.0:
            target = target * (1 - self.smoothing) + self.smoothing / num_classes
        if self.target_threshold is not None:
            target = (target > self.target_threshold).astype(x.dtype)
        return binary_cross_entropy_with_logits(x, target, reduction=self.reduction)

    def __to_config__(self):
        return dataclasses.asdict(self) | {"name": type(self).__name__}


@dataclasses.dataclass(frozen=True)
class CrossEntropyLoss:
    """Softmax cross-entropy over the last axis, torch.nn.CrossEntropyLoss
    semantics: integer class labels or class-probability targets, optional
    label smoothing. The reference uses it for the plain (non-B-cos) ViT
    baselines (`bcos/experiments/ImageNet/vit_final/experiment_parameters.py:
    119-120`)."""

    label_smoothing: float = 0.0
    reduction: str = "mean"

    def __call__(self, x, target):
        assert x.shape[0] == target.shape[0]
        num_classes = x.shape[-1]
        logp = jax.nn.log_softmax(x, axis=-1)
        if target.ndim == x.ndim:  # class-probability targets
            probs = target.astype(x.dtype)
            if self.label_smoothing > 0.0:
                probs = (
                    probs * (1 - self.label_smoothing)
                    + self.label_smoothing / num_classes
                )
            loss = -(probs * logp).sum(axis=-1)
        else:
            nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
            if self.label_smoothing > 0.0:
                smooth = -logp.mean(axis=-1)
                loss = (1 - self.label_smoothing) * nll + self.label_smoothing * smooth
            else:
                loss = nll
        if self.reduction == "mean":
            return jnp.mean(loss)
        if self.reduction == "sum":
            return jnp.sum(loss)
        return loss

    def __to_config__(self):
        return dataclasses.asdict(self) | {"name": type(self).__name__}


@dataclasses.dataclass(frozen=True)
class UniformOffLabelsBCEWithLogitsLoss:
    """BCE with off-labels clamped to 1/N (or `off_label`) — the B-cos training
    criterion (losses.py:99-139)."""

    reduction: str = "mean"
    off_label: Optional[float] = None

    def __call__(self, x, target):
        assert x.shape[0] == target.shape[0]
        num_classes = x.shape[-1]
        off_value = self.off_label or (1.0 / num_classes)
        target = _one_hot_if_needed(x, target)
        target = jnp.clip(target, off_value, None)
        return binary_cross_entropy_with_logits(x, target, reduction=self.reduction)

    def __to_config__(self):
        return dataclasses.asdict(self) | {"name": type(self).__name__}


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps, None)


def info_nce(
    query,
    positive_key,
    negative_keys=None,
    temperature=0.1,
    reduction="mean",
    negative_mode="unpaired",
):
    """Contrastive InfoNCE (losses.py:197-252)."""
    query = _l2_normalize(query)
    positive_key = _l2_normalize(positive_key)
    if negative_keys is not None:
        negative_keys = _l2_normalize(negative_keys)
        positive_logit = jnp.sum(query * positive_key, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            negative_logits = query @ negative_keys.T
        elif negative_mode == "paired":
            negative_logits = jnp.einsum("nd,nmd->nm", query, negative_keys)
        else:
            raise ValueError(negative_mode)
        logits = jnp.concatenate([positive_logit, negative_logits], axis=1)
        labels = jnp.zeros((logits.shape[0],), jnp.int32)
    else:
        logits = query @ positive_key.T
        labels = jnp.arange(query.shape[0], dtype=jnp.int32)
    return cross_entropy(logits / temperature, labels, reduction=reduction)


@dataclasses.dataclass(frozen=True)
class InfoNCELoss:
    temperature: float = 0.1
    reduction: str = "mean"
    negative_mode: str = "unpaired"

    def __call__(self, query, positive_key, negative_keys=None):
        return info_nce(
            query,
            positive_key,
            negative_keys,
            temperature=self.temperature,
            reduction=self.reduction,
            negative_mode=self.negative_mode,
        )


def gather_features(
    image_features,
    text_features,
    axis_name: str,
):
    """Cross-device gather of contrastive features with gradients
    (losses.py:288-332). `lax.all_gather`'s VJP reduce-scatters gradients back
    to the owning shard — the semantics of torch.distributed.nn.all_gather."""
    all_image = lax.all_gather(image_features, axis_name, tiled=True)
    all_text = lax.all_gather(text_features, axis_name, tiled=True)
    return all_image, all_text


@dataclasses.dataclass(frozen=True)
class ClipLoss:
    """open_clip contrastive loss (losses.py:335-400). ``axis_name`` replaces
    (rank, world_size): None means single-device."""

    local_loss: bool = False
    axis_name: Optional[str] = None

    def get_logits(self, image_features, text_features, logit_scale):
        if self.axis_name is not None:
            all_image, all_text = gather_features(
                image_features, text_features, self.axis_name
            )
            if self.local_loss:
                logits_per_image = logit_scale * image_features @ all_text.T
                logits_per_text = logit_scale * text_features @ all_image.T
            else:
                logits_per_image = logit_scale * all_image @ all_text.T
                logits_per_text = logits_per_image.T
        else:
            logits_per_image = logit_scale * image_features @ text_features.T
            logits_per_text = logit_scale * text_features @ image_features.T
        return logits_per_image, logits_per_text

    def get_ground_truth(self, num_logits, local_batch: int):
        labels = jnp.arange(num_logits, dtype=jnp.int32)
        if self.axis_name is not None and self.local_loss:
            labels = labels + local_batch * lax.axis_index(self.axis_name)
        return labels

    def __call__(self, image_features, text_features, logit_scale):
        lpi, lpt = self.get_logits(image_features, text_features, logit_scale)
        labels = self.get_ground_truth(lpi.shape[0], image_features.shape[0])
        return (cross_entropy(lpi, labels) + cross_entropy(lpt, labels)) / 2


@dataclasses.dataclass(frozen=True)
class CoCaLoss(ClipLoss):
    """CoCa contrastive + captioning loss (losses.py:403-446)."""

    caption_loss_weight: float = 1.0
    clip_loss_weight: float = 1.0
    pad_id: int = 0

    def __call__(self, image_features, text_features, logits, labels, logit_scale):
        clip_loss = jnp.zeros(())
        if self.clip_loss_weight:
            clip_loss = self.clip_loss_weight * ClipLoss.__call__(
                self, image_features, text_features, logit_scale
            )
        caption_loss = self.caption_loss_weight * cross_entropy(
            logits, labels, ignore_index=self.pad_id
        )
        return clip_loss, caption_loss


@dataclasses.dataclass(frozen=True)
class DistillClipLoss(ClipLoss):
    """CLIP KD loss (losses.py:449-485)."""

    def dist_loss(self, teacher_logits, student_logits):
        return jnp.mean(
            -jnp.sum(
                jax.nn.softmax(teacher_logits, axis=1)
                * jax.nn.log_softmax(student_logits, axis=1),
                axis=1,
            )
        )

    def __call__(
        self,
        image_features,
        text_features,
        logit_scale,
        dist_image_features,
        dist_text_features,
        dist_logit_scale,
    ):
        lpi, lpt = self.get_logits(image_features, text_features, logit_scale)
        dlpi, dlpt = self.get_logits(
            dist_image_features, dist_text_features, dist_logit_scale
        )
        labels = self.get_ground_truth(lpi.shape[0], image_features.shape[0])
        contrastive = (cross_entropy(lpi, labels) + cross_entropy(lpt, labels)) / 2
        distill = (self.dist_loss(dlpi, lpi) + self.dist_loss(dlpt, lpt)) / 2
        return contrastive, distill


def _ring_perms(axis_size: int):
    to_right = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    to_left = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    return to_right, to_left


def neighbour_exchange(tensor, axis_name: str, direction: str = "right"):
    """One ring hop over the mesh axis (losses.py:488-505 / 541-555).

    'right' sends to rank+1 (so each device receives its left neighbour's
    tensor). Differentiable: ppermute's transpose is the inverse permutation.
    """
    size = lax.axis_size(axis_name)
    to_right, to_left = _ring_perms(size)
    return lax.ppermute(tensor, axis_name, to_right if direction == "right" else to_left)


def neighbour_exchange_bidir(tensor_to_left, tensor_to_right, axis_name: str):
    """Bidirectional ring hop (losses.py:508-573): returns
    (tensor_from_right, tensor_from_left)."""
    from_left = neighbour_exchange(tensor_to_right, axis_name, "right")
    from_right = neighbour_exchange(tensor_to_left, axis_name, "left")
    return from_right, from_left


@dataclasses.dataclass(frozen=True)
class SigLipLoss:
    """Sigmoid pairwise CLIP loss (SigLIP, arXiv 2303.15343) — the production
    KD criterion (losses.py:576-694).

    The distributed path rotates *text* features around the device ring
    (world_size-1 hops, bidirectional by default) so each device scores its
    local images against every device's texts without a global all_gather.
    Call inside shard_map with ``axis_name`` set.

    ``cos_scaling`` (losses.py:612-624) handles attn-unpool models whose image
    features are per-location (HW, N, D): spatial logits are cosine-power
    weighted and mean-pooled over locations. It participates in explanation
    mode (the loss is a DetachableModule in the reference) via ``explain``.

    DOCUMENTED DEVIATION: the reference's ring hops call ``_loss`` with the
    default ``cos_scaling=0`` even when the local term uses a power (ref
    losses.py:656-694) — its hop path would simply crash on (HW, N, D)
    features. Here ``cos_scaling`` is threaded into every hop so the
    distributed loss equals the global-matrix loss for attn-unpool models
    (the property tests/test_losses.py locks for the pooled case).
    """

    bidir: bool = True
    axis_name: Optional[str] = None

    def get_ground_truth(self, dtype, num_logits: int, negative_only: bool):
        labels = -jnp.ones((num_logits, num_logits), dtype=dtype)
        if not negative_only:
            labels = 2 * jnp.eye(num_logits, dtype=dtype) + labels
        return labels

    def get_logits(
        self, image_features, text_features, logit_scale, logit_bias, cos_scaling, explain
    ):
        logits = image_features @ text_features.T
        if cos_scaling > 0:
            w = jnp.abs(jnp.power(logits, cos_scaling - 1))
            if explain:
                w = lax.stop_gradient(w)
            logits = logits * w
            logits = jnp.mean(logits, axis=0)
        if logit_scale is not None:
            logits = logit_scale * logits
        if logit_bias is not None:
            logits = logits + logit_bias
        return logits

    def _loss(
        self,
        image_features,
        text_features,
        logit_scale,
        logit_bias=None,
        negative_only=False,
        cos_scaling=0,
        explain=False,
    ):
        logits = self.get_logits(
            image_features, text_features, logit_scale, logit_bias, cos_scaling, explain
        )
        batch_size = (
            image_features.shape[1] if cos_scaling > 0 else image_features.shape[0]
        )
        labels = self.get_ground_truth(
            image_features.dtype, batch_size, negative_only
        )
        return -jnp.sum(jax.nn.log_sigmoid(labels * logits)) / batch_size

    def __call__(
        self,
        image_features,
        text_features,
        logit_scale,
        logit_bias,
        cos_scaling: int = 0,
        explain: bool = False,
    ):
        loss = self._loss(
            image_features,
            text_features,
            logit_scale,
            logit_bias,
            negative_only=False,
            cos_scaling=cos_scaling,
            explain=explain,
        )

        if self.axis_name is not None:
            world_size = lax.axis_size(self.axis_name)
            if world_size > 1:
                if self.bidir:
                    to_right = to_left = text_features
                    num_bidir, remainder = divmod(world_size - 1, 2)
                    for _ in range(num_bidir):
                        from_right, from_left = neighbour_exchange_bidir(
                            to_left, to_right, self.axis_name
                        )
                        for f in (from_right, from_left):
                            loss += self._loss(
                                image_features,
                                f,
                                logit_scale,
                                logit_bias,
                                negative_only=True,
                                cos_scaling=cos_scaling,
                                explain=explain,
                            )
                        to_left, to_right = from_right, from_left
                    if remainder:
                        from_left = neighbour_exchange(to_right, self.axis_name, "right")
                        loss += self._loss(
                            image_features,
                            from_left,
                            logit_scale,
                            logit_bias,
                            negative_only=True,
                            cos_scaling=cos_scaling,
                            explain=explain,
                        )
                else:
                    to_right = text_features
                    for _ in range(world_size - 1):
                        from_left = neighbour_exchange(to_right, self.axis_name, "right")
                        loss += self._loss(
                            image_features,
                            from_left,
                            logit_scale,
                            logit_bias,
                            negative_only=True,
                            cos_scaling=cos_scaling,
                            explain=explain,
                        )
                        to_right = from_left

        return loss

    def __to_config__(self):
        return {"name": type(self).__name__, "bidir": self.bidir}
