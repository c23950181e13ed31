"""CLIP in flax.linen — image towers (ModifiedResNet / ViT) + text transformer.

Parity target: the vendored OpenAI CLIP fork `/root/reference/CLIP/clip/
model.py` (ModifiedResNet with 3-conv stem + anti-aliased strided convs +
attention-pool head :94-154; text transformer with causal mask + QuickGELU
:157-203, 244-373; `build_model(state_dict, pretrained)` config sniffing
:400-438).

The image tower is parameterised by layer factories so the SAME architecture
serves as (a) the frozen fp32 teacher (plain convs/BN/attnpool) and (b) the
B-cosified student (BcosifyConv2d, uncentered BN, BcosAttentionPool2d — see
bcosify/clip_import.py). All NHWC / sequence-major.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bcosification_tpu.models.vit import PlainLinear
from bcosification_tpu.modules import norms
from bcosification_tpu.modules.bcosattnpool import AttentionPool2d, BcosAttentionPool2d
from bcosification_tpu.ops import pooling

__all__ = [
    "QuickGELU",
    "CLIPLayerNorm",
    "PlainConv2d",
    "EvalBatchNorm",
    "CLIPBottleneck",
    "ModifiedResNet",
    "CLIPVisionTransformer",
    "TextTransformer",
    "CLIP",
    "clip_rn50_config",
    "config_from_state_dict",
]


class QuickGELU(nn.Module):
    """CLIP's x*sigmoid(1.702x). ``detach_gate`` makes it dynamic-linear in
    explanation mode (the bcosified-ViT student; ≙ MyGELU's detached gate,
    bcosify_vit.py:27-32) — the teacher keeps the plain nonlinearity."""

    detach_gate: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        gate = jax.nn.sigmoid(1.702 * x)
        if self.detach_gate and explain:
            gate = jax.lax.stop_gradient(gate)
        return x * gate


class CLIPLayerNorm(nn.Module):
    """LayerNorm computed in fp32 (CLIP/clip/model.py:157-163)."""

    features: int
    eps: float = 1e-5
    use_bias: bool = True
    use_weight: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        if explain:
            var = jax.lax.stop_gradient(var)
        out = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.use_weight:
            out = out * self.param(
                "weight", nn.initializers.ones, (self.features,), jnp.float32
            )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        return out.astype(x.dtype)


class PlainConv2d(nn.Module):
    """nn.Conv2d equivalent (HWIO 'weight')."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = False
    groups: int = 1
    dilation: Union[int, Tuple[int, int]] = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        from bcosification_tpu.ops import bcos as ops

        kh, kw = ops._pair(self.kernel_size)
        in_ch = x.shape[-1]
        shape = (kh, kw, in_ch // self.groups, self.features)
        fan_in = kh * kw * in_ch // self.groups
        bound = 1.0 / math.sqrt(fan_in)
        w = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            shape,
        )
        out = ops._conv(
            x, w.astype(x.dtype), self.stride, self.padding, self.dilation,
            self.groups, allow_int8=not explain and not train,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(out.dtype)
        return out


class EvalBatchNorm(nn.Module):
    """Centered BN used by the frozen CLIP teacher (eval only: running stats)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        inv = (w / jnp.sqrt(var + self.eps)).astype(x.dtype)
        return x * inv + (b - mean * w / jnp.sqrt(var + self.eps)).astype(x.dtype)


class _ReLU(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        return jax.nn.relu(x)


class CLIPBottleneck(nn.Module):
    """Anti-aliased bottleneck (CLIP/clip/model.py:10-55): all convs stride 1,
    avgpool after conv2 when stride > 1; downsample = avgpool + 1x1 conv."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    expansion: int = 4
    conv_layer: Callable = PlainConv2d
    norm_layer: Callable = EvalBatchNorm
    act_layer: Callable = _ReLU

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        identity = x
        out = self.conv_layer(self.planes, kernel_size=1, name="conv1")(x, **f)
        out = self.norm_layer(self.planes, name="bn1")(out, **f)
        out = self.act_layer(name="relu1")(out, **f)
        out = self.conv_layer(self.planes, kernel_size=3, padding=1, name="conv2")(out, **f)
        out = self.norm_layer(self.planes, name="bn2")(out, **f)
        out = self.act_layer(name="relu2")(out, **f)
        if self.stride > 1:
            out = pooling.avg_pool2d(out, self.stride, self.stride)
        out = self.conv_layer(self.planes * self.expansion, kernel_size=1, name="conv3")(out, **f)
        out = self.norm_layer(self.planes * self.expansion, name="bn3")(out, **f)
        if self.has_downsample:
            identity = x
            if self.stride > 1:
                identity = pooling.avg_pool2d(identity, self.stride, self.stride)
            identity = self.conv_layer(
                self.planes * self.expansion, kernel_size=1, name="downsample_conv"
            )(identity, **f)
            identity = self.norm_layer(
                self.planes * self.expansion, name="downsample_norm"
            )(identity, **f)
        out = out + identity
        return self.act_layer(name="relu3")(out, **f)


class ModifiedResNet(nn.Module):
    """CLIP's ModifiedResNet (CLIP/clip/model.py:94-154), factory-parameterised.

    ``attnpool``: 'standard' | 'bcos' | 'bcos_unpool' | None (feature map out).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    conv_layer: Callable = PlainConv2d
    norm_layer: Callable = EvalBatchNorm
    act_layer: Callable = _ReLU
    attnpool: Optional[str] = "standard"
    attnpool_linear_layer: Callable = PlainLinear
    attnpool_c_proj_layer: Callable = PlainLinear

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        w = self.width
        # 3-conv stem
        x = self.conv_layer(w // 2, kernel_size=3, stride=2, padding=1, name="conv1")(x, **f)
        x = self.norm_layer(w // 2, name="bn1")(x, **f)
        x = self.act_layer(name="relu1")(x, **f)
        x = self.conv_layer(w // 2, kernel_size=3, padding=1, name="conv2")(x, **f)
        x = self.norm_layer(w // 2, name="bn2")(x, **f)
        x = self.act_layer(name="relu2")(x, **f)
        x = self.conv_layer(w, kernel_size=3, padding=1, name="conv3")(x, **f)
        x = self.norm_layer(w, name="bn3")(x, **f)
        x = self.act_layer(name="relu3")(x, **f)
        x = pooling.avg_pool2d(x, 2, 2)

        inplanes = w
        for stage, n_blocks in enumerate(self.layers):
            planes = w * (2**stage)
            for j in range(n_blocks):
                stride = 2 if (stage > 0 and j == 0) else 1
                has_ds = stride > 1 or inplanes != planes * 4
                x = CLIPBottleneck(
                    planes=planes,
                    stride=stride,
                    has_downsample=has_ds,
                    conv_layer=self.conv_layer,
                    norm_layer=self.norm_layer,
                    act_layer=self.act_layer,
                    name=f"layer{stage + 1}_{j}",
                )(x, **f)
                inplanes = planes * 4

        embed_dim = w * 32
        if self.attnpool is None:
            return x
        if self.attnpool == "standard":
            return AttentionPool2d(
                embed_dim,
                self.heads,
                self.output_dim,
                spacial_dim=self.input_resolution // 32,
                name="attnpool",
            )(x, **f)
        return BcosAttentionPool2d(
            embed_dim,
            self.heads,
            self.output_dim,
            attn_unpool=(self.attnpool == "bcos_unpool"),
            linear_layer=self.attnpool_linear_layer,
            c_proj_layer=self.attnpool_c_proj_layer,
            name="attnpool",
        )(x, **f)


class ResidualAttentionBlock(nn.Module):
    """CLIP/clip/model.py:171-192. Combined in_proj qkv like torch MHA.

    ``linear_layer``/``act_layer`` inject B-cos variants for the bcosified
    ViT student (out_proj + MLP only; the qkv in_proj is never bcosified,
    matching bcosify.py:95's q/k/v skip rule). Defaults reproduce the plain
    CLIP tower bit-for-bit."""

    d_model: int
    n_head: int
    causal: bool = False
    linear_layer: Optional[Callable] = None
    act_layer: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        d = self.d_model
        linear = self.linear_layer or PlainLinear
        act = self.act_layer or QuickGELU

        def attention(t):
            qkv = PlainLinear(3 * d, name="attn_in_proj")(t)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            b, n, _ = q.shape
            dh = d // self.n_head

            def split(u):
                return u.reshape(b, n, self.n_head, dh).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            if explain:
                qh = jax.lax.stop_gradient(qh)
                kh = jax.lax.stop_gradient(kh)
            dots = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / jnp.sqrt(dh).astype(t.dtype)
            if self.causal:
                mask = jnp.triu(jnp.full((n, n), -jnp.inf, t.dtype), k=1)
                dots = dots + mask
            attn = jax.nn.softmax(dots, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
            out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
            return linear(d, name="attn_out_proj")(out, **f)

        x = x + attention(CLIPLayerNorm(d, name="ln_1")(x, **f))
        h = CLIPLayerNorm(d, name="ln_2")(x, **f)
        h = linear(4 * d, name="mlp_c_fc")(h, **f)
        h = act(name="mlp_gelu")(h, **f)
        h = linear(d, name="mlp_c_proj")(h, **f)
        return x + h


class TextTransformer(nn.Module):
    """The CLIP text tower (CLIP/clip/model.py:283-296, 344-357)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024

    @nn.compact
    def __call__(self, text, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width)
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok[text] + pos[None, : text.shape[1]]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal=True, name=f"resblocks_{i}"
            )(x, **f)
        x = CLIPLayerNorm(self.width, name="ln_final")(x, **f)
        # features from the eot token (highest token id per sequence)
        eot = jnp.argmax(text, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return x @ proj


class CLIPVisionTransformer(nn.Module):
    """CLIP ViT image tower (CLIP/clip/model.py:206-241).

    ``conv_layer``/``linear_layer``/``act_layer`` inject B-cos variants for
    the bcosified student (patchify conv channel-doubled outside, in the
    importer); defaults reproduce the plain tower."""

    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    conv_layer: Optional[Callable] = None
    linear_layer: Optional[Callable] = None
    act_layer: Optional[Callable] = None
    unpool: bool = False  # per-token features (ViT analogue of attn_unpool)

    @nn.compact
    def __call__(self, x, *, train: bool = False, explain: bool = False):
        f = dict(train=train, explain=explain)
        conv = self.conv_layer or partial(PlainConv2d, use_bias=False)
        x = conv(
            self.width,
            kernel_size=self.patch_size,
            stride=self.patch_size,
            name="conv1",
        )(x, **f)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        cls = self.param(
            "class_embedding", nn.initializers.normal(self.width**-0.5), (self.width,)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width**-0.5),
            (h * w + 1, self.width),
        )
        x = x + pos[None].astype(x.dtype)
        x = CLIPLayerNorm(self.width, name="ln_pre")(x, **f)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width,
                self.heads,
                linear_layer=self.linear_layer,
                act_layer=self.act_layer,
                name=f"resblocks_{i}",
            )(x, **f)
        proj = self.param(
            "proj", nn.initializers.normal(self.width**-0.5), (self.width, self.output_dim)
        )
        if self.unpool:
            # per-location token features, L2-normalised — the ViT analogue
            # of BcosAttentionPool2d's attn_unpool ([B, HW, D], the basis for
            # text localisation / cosine-power pooling)
            tok = CLIPLayerNorm(self.width, name="ln_post")(x[:, 1:], **f)
            out = tok @ proj
            norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
            if explain:
                norm = jax.lax.stop_gradient(norm)
            return out / norm
        x = CLIPLayerNorm(self.width, name="ln_post")(x[:, 0][:, None], **f)[:, 0]
        return x @ proj


class CLIP(nn.Module):
    """Full CLIP (CLIP/clip/model.py:244-373): visual is any module mapping
    images -> embeddings; text tower standard."""

    visual: nn.Module
    text: nn.Module

    def encode_image(self, image, *, train: bool = False, explain: bool = False):
        return self.visual(image, train=train, explain=explain)

    def encode_text(self, text, *, train: bool = False, explain: bool = False):
        return self.text(text, train=train, explain=explain)

    @nn.compact
    def __call__(self, image, text, *, train: bool = False, explain: bool = False):
        img = self.encode_image(image, train=train, explain=explain)
        txt = self.encode_text(text, train=train, explain=explain)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        logit_scale = jnp.exp(
            self.param(
                "logit_scale",
                nn.initializers.constant(float(np.log(1 / 0.07))),
                (),
            )
        )
        logits_per_image = logit_scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def clip_rn50_config():
    return dict(
        embed_dim=1024,
        image_resolution=224,
        vision_layers=(3, 4, 6, 3),
        vision_width=64,
        vision_patch_size=None,
        context_length=77,
        vocab_size=49408,
        transformer_width=512,
        transformer_heads=8,
        transformer_layers=12,
    )


def clip_vit_config(name: str = "ViT-B/32"):
    """Published OpenAI CLIP ViT architectures (CLIP/clip/model.py shapes),
    for building towers without a checkpoint (pretrained=False path)."""
    width, layers, patch, embed = {
        "ViT-B/32": (768, 12, 32, 512),
        "ViT-B/16": (768, 12, 16, 512),
        "ViT-L/14": (1024, 24, 14, 768),
    }[name]
    return dict(
        embed_dim=embed,
        image_resolution=224,
        vision_layers=layers,
        vision_width=width,
        vision_patch_size=patch,
        context_length=77,
        vocab_size=49408,
        transformer_width=512 if "B/" in name else 768,
        transformer_heads=8 if "B/" in name else 12,
        transformer_layers=12,
    )


def config_from_state_dict(sd) -> dict:
    """Infer the CLIP architecture from a checkpoint (CLIP/clip/model.py:400-424)."""
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [
            len(set(k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")))
            for b in [1, 2, 3, 4]
        ]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = None
        image_resolution = out_width * 32
    return dict(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            set(k.split(".")[2] for k in sd if k.startswith("transformer.resblocks"))
        ),
    )
