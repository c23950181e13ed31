"""BCOS_INT8 dynamic-int8 serving quantization (ops/bcos._conv_int8_dynamic).

Serving-only approximation mode: with BCOS_INT8=1, plain VALUE forwards
dispatch convs to int8 (per-tensor activation scale, per-output-channel
weight scale, int32 accumulation, bf16 dequant); explain-mode forwards are
NEVER quantized (the quantizer's round() has zero gradient, and W(x)
exactness is the product contract). No reference equivalent — this is a
beyond-reference serving optimization; per-conv speedups of 2.2-2.9x on the
deep RN50 shapes were measured on v5e (scripts/perf_probe17.py,
docs/PERF.md round-4 section).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcosification_tpu.ops import bcos as ops
from bcosification_tpu.ops.pallas.bcos_conv1x1 import bcos_conv1x1_bn_act


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale,
        dtype=jnp.bfloat16,
    )


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


class TestInt8Conv:
    def test_close_to_fp32(self):
        x = _rand((2, 8, 8, 32), 0)
        w = _rand((3, 3, 32, 16), 1, 0.1)
        yq = ops._conv_int8_dynamic(x, w, 1, 1, 1, 1)
        y = ops._conv(x.astype(jnp.float32), w.astype(jnp.float32), 1, 1, 1, 1)
        assert yq.dtype == jnp.bfloat16
        assert _rel_err(yq, y) < 0.03

    def test_grouped_strided_dilated(self):
        x = _rand((2, 12, 12, 16), 2)
        w = _rand((3, 3, 8, 32), 3, 0.2)  # groups=2
        yq = ops._conv_int8_dynamic(x, w, 2, 2, 2, 2)
        y = ops._conv(
            x.astype(jnp.float32), w.astype(jnp.float32), 2, 2, 2, 2
        )
        assert yq.shape == y.shape
        assert _rel_err(yq, y) < 0.03

    def test_zero_input_no_nan(self):
        x = jnp.zeros((1, 4, 4, 8), jnp.bfloat16)
        w = _rand((1, 1, 8, 8), 4)
        yq = ops._conv_int8_dynamic(x, w, 1, 0, 1, 1)
        assert np.all(np.asarray(yq, np.float32) == 0.0)

    def test_per_channel_weight_scale(self):
        # one output channel with 100x larger weights must not destroy the
        # quantization of the small channels (per-channel scales, not
        # per-tensor)
        x = _rand((2, 6, 6, 16), 5)
        w = np.asarray(_rand((1, 1, 16, 8), 6, 0.1), np.float32)
        w[..., 0] *= 100.0
        w = jnp.asarray(w, jnp.bfloat16)
        yq = ops._conv_int8_dynamic(x, w, 1, 0, 1, 1)
        y = ops._conv(x.astype(jnp.float32), w.astype(jnp.float32), 1, 0, 1, 1)
        # small channels stay accurate despite the huge channel 0
        assert _rel_err(yq[..., 1:], y[..., 1:]) < 0.03


class TestDispatchGating:
    def test_off_by_default(self):
        x = _rand((1, 6, 6, 8), 7)
        w = _rand((3, 3, 8, 8), 8, 0.2)
        y0 = ops.bcos_conv2d(x, w, b=2, padding=1)
        jaxpr = jax.make_jaxpr(
            lambda xx, ww: ops.bcos_conv2d(xx, ww, b=2, padding=1)
        )(x, w)
        assert "i8" not in str(jaxpr)
        assert np.isfinite(np.asarray(y0, np.float32)).all()

    def test_env_enables_value_path_only(self, monkeypatch):
        x = _rand((1, 6, 6, 8), 9)
        w = _rand((3, 3, 8, 8), 10, 0.2)
        y_ref = ops.bcos_conv2d(x, w, b=2, padding=1)
        y_ref_explain = ops.bcos_conv2d(x, w, b=2, padding=1, explain=True)
        np.testing.assert_array_equal(
            np.asarray(y_ref, np.float32), np.asarray(y_ref_explain, np.float32)
        )

        monkeypatch.setenv("BCOS_INT8", "1")
        y_q = ops.bcos_conv2d(x, w, b=2, padding=1)
        y_q_explain = ops.bcos_conv2d(x, w, b=2, padding=1, explain=True)

        # explain path NEVER quantizes: bit-identical to the unquantized ref
        np.testing.assert_array_equal(
            np.asarray(y_q_explain, np.float32), np.asarray(y_ref, np.float32)
        )
        # the value path actually dispatched (int8 ops in the jaxpr) and is
        # close-but-not-identical
        jaxpr = str(
            jax.make_jaxpr(
                lambda xx, ww: ops.bcos_conv2d(xx, ww, b=2, padding=1)
            )(x, w)
        )
        assert "i8" in jaxpr
        assert _rel_err(y_q, y_ref) < 0.05
        assert not np.array_equal(
            np.asarray(y_q, np.float32), np.asarray(y_ref, np.float32)
        )

    def test_fp32_never_quantized(self, monkeypatch):
        monkeypatch.setenv("BCOS_INT8", "1")
        x = jnp.asarray(
            np.random.default_rng(11).standard_normal((1, 6, 6, 8)), jnp.float32
        )
        w = jnp.asarray(
            np.random.default_rng(12).standard_normal((3, 3, 8, 8)) * 0.2,
            jnp.float32,
        )
        jaxpr = str(
            jax.make_jaxpr(
                lambda xx, ww: ops.bcos_conv2d(xx, ww, b=2, padding=1)
            )(x, w)
        )
        assert "i8" not in jaxpr

    def test_epilogue_1x1_path_dispatches(self, monkeypatch):
        # the bottleneck 1x1-with-folded-BN route (_jnp_path) must also
        # quantize on value forwards and stay exact on explain forwards
        x = _rand((2, 4, 4, 16), 13)
        w2 = _rand((16, 8), 14, 0.2)
        mult = jnp.ones((8,), jnp.float32)
        add = jnp.zeros((8,), jnp.float32)
        y_ref = bcos_conv1x1_bn_act(x, w2, None, mult, add, relu=True)
        monkeypatch.setenv("BCOS_INT8", "1")
        y_q = bcos_conv1x1_bn_act(x, w2, None, mult, add, relu=True)
        y_q_explain = bcos_conv1x1_bn_act(
            x, w2, None, mult, add, relu=True, explain=True
        )
        np.testing.assert_array_equal(
            np.asarray(y_q_explain, np.float32), np.asarray(y_ref, np.float32)
        )
        assert _rel_err(y_q, y_ref) < 0.05


class TestModuleLevel:
    def test_bcos_conv_module_explain_values_unaffected(self, monkeypatch):
        from bcosification_tpu.modules.bcos_layers import BcosConv2d

        mod = BcosConv2d(features=8, kernel_size=3, padding=1)
        x = _rand((1, 6, 6, 4), 15)
        var = mod.init(jax.random.PRNGKey(0), x)
        y_ref = mod.apply(var, x)
        monkeypatch.setenv("BCOS_INT8", "1")
        y_q = mod.apply(var, x)
        y_q_explain = mod.apply(var, x, explain=True)
        np.testing.assert_array_equal(
            np.asarray(y_q_explain, np.float32), np.asarray(y_ref, np.float32)
        )
        assert _rel_err(y_q, y_ref) < 0.05
