"""SimpleViT / ViT-C family (flax.linen), B-cos-parameterisable.

Parity target: `/root/reference/bcos/models/vit.py` (lucidrains SimpleViT
parameterised by linear/norm/act/conv2d layer factories; sincos-2D positional
embedding :64-86; detachable Attention with q/k stop-gradient in explanation
mode :143-158; optional conv stem (ViT-C) :342-365; gap_reorder head-then-mean
:323-339) and the ViT bcosification rewrite (`/root/reference/bcosify_vit.py`):
to_qkv stays a plain Linear (:138), other Linears become BcosifyLinear, GELU ->
detachable GELU, LayerNorm -> DetachableLayerNorm.

Sequence layout: tokens on the second-to-last axis, features last — MXU
friendly; patches are extracted with a reshape/transpose
(b (h p1) (w p2) c -> b (h w) (p1 p2 c), pixel-major channel-last groups, the
exact flattening the reference's channel-doubling transform assumes).
"""
from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from bcosification_tpu.modules import (
    BcosLinear,
    DetachableGELU,
    Identity,
    LogitLayer,
    NormedLinear,
    norms,
)

__all__ = [
    "pos_emb_sincos_2d",
    "PlainLinear",
    "Attention",
    "FeedForward",
    "Encoder",
    "SimpleViT",
    "simple_vit_ti_patch16_224",
    "simple_vit_s_patch16_224",
    "simple_vit_b_patch16_224",
    "simple_vit_l_patch16_224",
    "vitc_ti_patch1_14",
    "vitc_s_patch1_14",
    "vitc_b_patch1_14",
    "vitc_l_patch1_14",
]


class PlainLinear(nn.Module):
    """nn.Linear equivalent, weight (in, out) named 'weight'."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        *,
        train: bool = False,
        explain: bool = False,
        weight_only: bool = False,
    ):
        # ``weight_only`` skips the bias — the reference's pooled attnpool
        # feeds only projection WEIGHTS into F.multi_head_attention_forward
        # (bcos/modules/bcosattnpool.py:40-59); params stay identical.
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        w = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (in_features, self.features),
        )
        out = jnp.dot(
            x,
            w.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
        )
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,),
            )
            if not weight_only:
                out = out + b
        return out


def pos_emb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10_000.0, dtype=jnp.float32):
    """vit.py:64-86."""
    assert dim % 4 == 0, "feature dimension must be multiple of 4 for sincos emb"
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    omega = jnp.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature**omega)
    y = y.flatten()[:, None] * omega[None, :]
    x = x.flatten()[:, None] * omega[None, :]
    pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1)
    return pe.astype(dtype)


class FeedForward(nn.Module):
    """vit.py:89-113 (norm -> linear1 -> act -> linear2)."""

    hidden_dim: int
    out_dim: int
    linear_layer: Callable = BcosLinear
    norm_layer: Callable = norms.DetachableLayerNorm
    act_layer: Callable = Identity

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        x = self.norm_layer(x.shape[-1], name="norm")(x, **f)
        x = self.linear_layer(self.hidden_dim, name="linear1")(x, **f)
        x = self.act_layer(name="act")(x, **f)
        x = self.linear_layer(self.out_dim, name="linear2")(x, **f)
        return x


class MoEFeedForward(nn.Module):
    """Beyond-reference: switch-MoE variant of FeedForward — the projection
    linear becomes a BcosMoE (top-1-routed B-cos experts, modules/moe.py),
    the expansion stays shared. Parameter count scales with num_experts at
    constant per-token FLOPs; experts shard over the 'model' mesh axis via
    moe.ep_param_specs. Opt-in through SimpleViT(moe_experts=E).

    The MoE must be LAST: capacity-dropped tokens emit exact-zero rows
    (the switch-transformer residual contract), and a B-cos linear placed
    after them would hit ||x||=0 whose sqrt-VJP is inf -> NaN grads. As the
    block output, the zero rows flow straight into the Encoder's residual
    add, which is exactly what token dropping means.

    The experts inherit the model's B-cos configuration: `b` is read from the
    injected linear_layer partial (the experiment factories bake it in);
    biased linears are rejected — BcosMoE experts are bias-free."""

    num_experts: int
    hidden_dim: int
    out_dim: int
    linear_layer: Callable = BcosLinear
    norm_layer: Callable = norms.DetachableLayerNorm
    act_layer: Callable = Identity
    capacity_factor: float = 1.25
    top_k: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        import functools

        from bcosification_tpu.modules.moe import BcosMoE

        b = 2.0
        if isinstance(self.linear_layer, functools.partial):
            b = self.linear_layer.keywords.get("b", b)
            if self.linear_layer.keywords.get("use_bias", False):
                raise ValueError(
                    "moe_experts>0 with use_bias=True linears: BcosMoE "
                    "experts are bias-free; disable the bias or the MoE"
                )

        f = dict(train=train, explain=explain)
        x = self.norm_layer(x.shape[-1], name="norm")(x, **f)
        x = self.linear_layer(self.hidden_dim, name="linear1")(x, **f)
        x = self.act_layer(name="act")(x, **f)
        x = BcosMoE(
            self.num_experts, self.out_dim, b=b,
            capacity_factor=self.capacity_factor, top_k=self.top_k,
            name="moe2",
        )(x, **f)
        return x


class Attention(nn.Module):
    """vit.py:116-158: plain to_qkv Linear (bias-free), q/k detached in
    explanation mode, to_out via the injected linear layer."""

    heads: int
    dim_head: int
    linear_layer: Callable = BcosLinear
    norm_layer: Callable = norms.DetachableLayerNorm
    qkv_layer: Callable = PlainLinear  # stays plain even when bcosified

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        x = self.norm_layer(dim, name="norm")(x, **f)
        qkv = self.qkv_layer(inner * 3, use_bias=False, name="to_qkv")(x, **f)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if explain:  # the attention matrix is part of the dynamic weights W(x)
            q = jax.lax.stop_gradient(q)
            k = jax.lax.stop_gradient(k)
        scale = self.dim_head**-0.5
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.linear_layer(dim, use_bias=False, name="to_out")(out, **f)


class Encoder(nn.Module):
    """vit.py:161-197 (pre-norm attention + FF, residual)."""

    heads: int
    dim_head: int
    mlp_dim: int
    linear_layer: Callable = BcosLinear
    norm_layer: Callable = norms.DetachableLayerNorm
    act_layer: Callable = Identity
    qkv_layer: Callable = PlainLinear
    moe_experts: int = 0  # >0: switch-MoE FFN (beyond-reference, see MoEFeedForward)
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        x = Attention(
            self.heads,
            self.dim_head,
            self.linear_layer,
            self.norm_layer,
            self.qkv_layer,
            name="attn",
        )(x, **f) + x
        if self.moe_experts > 0:
            ff = MoEFeedForward(
                self.moe_experts,
                self.mlp_dim,
                x.shape[-1],
                self.linear_layer,
                self.norm_layer,
                self.act_layer,
                capacity_factor=self.moe_capacity_factor,
                top_k=self.moe_top_k,
                name="ff",
            )
        else:
            ff = FeedForward(
                self.mlp_dim,
                x.shape[-1],
                self.linear_layer,
                self.norm_layer,
                self.act_layer,
                name="ff",
            )
        x = ff(x, **f) + x
        return x


def _patchify(img: jax.Array, p1: int, p2: int) -> jax.Array:
    """b (h p1) (w p2) c -> b h w (p1 p2 c)."""
    b, H, W, c = img.shape
    h, w = H // p1, W // p2
    x = img.reshape(b, h, p1, w, p2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b h w p1 p2 c
    return x.reshape(b, h, w, p1 * p2 * c)


class SimpleViT(nn.Module):
    """vit.py:230-339."""

    image_size: Union[int, Tuple[int, int]] = 224
    patch_size: Union[int, Tuple[int, int]] = 16
    num_classes: int = 1000
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_dim: int = 1536
    linear_layer: Callable = BcosLinear
    norm_layer: Callable = norms.DetachableLayerNorm
    act_layer: Callable = Identity
    norm2d_layer: Optional[Callable] = None
    conv2d_layer: Optional[Callable] = None
    qkv_layer: Callable = PlainLinear
    conv_stem: Optional[Sequence[int]] = None
    gap_reorder: bool = False
    with_logit_layer: bool = False
    logit_bias: Optional[float] = None
    logit_temperature: Optional[float] = None
    pos_embedding: bool = True
    moe_experts: int = 0  # >0: switch-MoE FFNs (beyond-reference)
    moe_capacity_factor: float = 1.25
    moe_top_k: int = 1

    @nn.compact
    def __call__(self, img, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        p1, p2 = (
            self.patch_size
            if isinstance(self.patch_size, tuple)
            else (self.patch_size, self.patch_size)
        )
        x = img
        if self.conv_stem:
            in_ch = x.shape[-1]
            for i, outc in enumerate(self.conv_stem):
                x = self.conv2d_layer(
                    outc,
                    kernel_size=3,
                    stride=(2 if outc > in_ch else 1),
                    padding=1,
                    name=f"conv_stem_{3 * i}",
                )(x, **f)
                x = self.norm2d_layer(outc, name=f"conv_stem_{3 * i + 1}")(x, **f)
                x = self.act_layer(name=f"conv_stem_{3 * i + 2}")(x, **f)
                in_ch = outc
        x = _patchify(x, p1, p2)
        x = self.linear_layer(self.dim, name="to_patch_embedding_linear")(x, **f)

        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        if self.pos_embedding:
            x = x + pos_emb_sincos_2d(h, w, d, dtype=x.dtype)

        dim_head = self.dim // self.heads
        for i in range(self.depth):
            x = Encoder(
                self.heads,
                dim_head,
                self.mlp_dim,
                self.linear_layer,
                self.norm_layer,
                self.act_layer,
                self.qkv_layer,
                moe_experts=self.moe_experts,
                moe_capacity_factor=self.moe_capacity_factor,
                moe_top_k=self.moe_top_k,
                name=f"encoder_{i}",
            )(x, **f)

        def head(t):
            t = self.norm_layer(t.shape[-1], name="linear_head_norm")(t, **f)
            return self.linear_layer(self.num_classes, name="linear_head_linear")(t, **f)

        if self.gap_reorder:
            x = head(x).mean(axis=1)
        else:
            x = head(x.mean(axis=1))

        if self.with_logit_layer:
            bias = (
                -math.log(self.num_classes - 1)
                if self.logit_bias is None
                else self.logit_bias
            )
            x = LogitLayer(self.logit_temperature, bias, name="logit_layer")(x, **f)
        return x


def _entry(**defaults):
    def factory(**kwargs):
        return SimpleViT(**{**defaults, **kwargs})

    return factory


simple_vit_ti_patch16_224 = _entry(image_size=224, patch_size=16, dim=192, heads=3, mlp_dim=768, depth=12)
simple_vit_s_patch16_224 = _entry(image_size=224, patch_size=16, dim=384, heads=6, mlp_dim=1536, depth=12)
simple_vit_b_patch16_224 = _entry(image_size=224, patch_size=16, dim=768, heads=12, mlp_dim=3072, depth=12)
simple_vit_l_patch16_224 = _entry(image_size=224, patch_size=16, dim=1024, heads=16, mlp_dim=4096, depth=14)
vitc_ti_patch1_14 = _entry(image_size=14, patch_size=1, depth=11, dim=192, heads=3, mlp_dim=768, conv_stem=(24, 48, 96, 192))
vitc_s_patch1_14 = _entry(image_size=14, patch_size=1, depth=11, dim=384, heads=6, mlp_dim=1536, conv_stem=(48, 96, 192, 384))
vitc_b_patch1_14 = _entry(image_size=14, patch_size=1, depth=11, dim=768, heads=12, mlp_dim=3072, conv_stem=(64, 128, 128, 256, 256, 512))
vitc_l_patch1_14 = _entry(image_size=14, patch_size=1, depth=13, dim=1024, heads=16, mlp_dim=4096, conv_stem=(64, 128, 128, 256, 256, 512))

VIT_CONFIGS = {
    "simple_vit_ti_patch16_224": dict(dim=192, heads=3, mlp_dim=768, depth=12, patch_size=16, image_size=224),
    "simple_vit_s_patch16_224": dict(dim=384, heads=6, mlp_dim=1536, depth=12, patch_size=16, image_size=224),
    "simple_vit_b_patch16_224": dict(dim=768, heads=12, mlp_dim=3072, depth=12, patch_size=16, image_size=224),
    "simple_vit_l_patch16_224": dict(dim=1024, heads=16, mlp_dim=4096, depth=14, patch_size=16, image_size=224),
}
