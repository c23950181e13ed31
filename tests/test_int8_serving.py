"""BCOS_INT8 dynamic-int8 serving quantization (ops/bcos._conv_int8_dynamic).

Serving-only approximation mode: with BCOS_INT8=1, plain inference VALUE
forwards dispatch convs to int8 (per-SAMPLE activation scale,
per-output-channel weight scale, int32 accumulation, bf16 dequant);
explain-mode AND train-mode forwards are NEVER quantized (the quantizer's
round() has zero gradient, W(x) exactness is the product contract, and
training under zero conv-weight gradients would be silently broken — so
differentiating the quantized conv raises). No reference equivalent — this
is a beyond-reference serving optimization; measured numbers live in
docs/PERF.md "int8 serving" (round 5): per-conv and end-to-end A/Bs via
scripts/perf_probe17.py / perf_probe18.py (all-conv, 0.967x) /
perf_probe19.py (selective BCOS_INT8_MIN_CH=128 — the default — 1.015x).
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

    def test_per_sample_activation_scale(self):
        # sample 0 is 100x larger than sample 1: with a per-TENSOR scale,
        # sample 1 would quantize to ~1 bit of range; the per-sample scale
        # keeps both accurate (ADVICE r4: batch-coupling)
        x = np.asarray(_rand((2, 8, 8, 16), 20), np.float32)
        x[0] *= 100.0
        x = jnp.asarray(x, jnp.bfloat16)
        w = _rand((3, 3, 16, 8), 21, 0.1)
        yq = ops._conv_int8_dynamic(x, w, 1, 1, 1, 1)
        y = ops._conv(x.astype(jnp.float32), w.astype(jnp.float32), 1, 1, 1, 1)
        assert _rel_err(yq[0], y[0]) < 0.03
        assert _rel_err(yq[1], y[1]) < 0.03

    def test_batch_composition_independent(self):
        # a given image's quantized output must not depend on its batchmates
        # (cross-request determinism for serving)
        small = np.asarray(_rand((1, 8, 8, 16), 22), np.float32)
        huge = small.copy() * 100.0
        w = _rand((3, 3, 16, 8), 23, 0.1)
        batch = jnp.asarray(np.concatenate([huge, small]), jnp.bfloat16)
        alone = jnp.asarray(small, jnp.bfloat16)
        y_batched = ops._conv_int8_dynamic(batch, w, 1, 1, 1, 1)[1]
        y_alone = ops._conv_int8_dynamic(alone, w, 1, 1, 1, 1)[0]
        np.testing.assert_array_equal(
            np.asarray(y_batched, np.float32), np.asarray(y_alone, np.float32)
        )

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
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")  # tiny test convs must still quantize
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

    def test_min_ch_threshold_gates_small_convs(self, monkeypatch):
        """BCOS_INT8_MIN_CH: convs whose operand channel count is below the
        threshold stay exact bf16 (probe17: int8 LOSES on the small-channel
        layer1 shapes; probe19 A/Bs the selective configuration)."""
        monkeypatch.setenv("BCOS_INT8", "1")
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "16")
        xs = _rand((1, 6, 6, 8), 30)
        ws = _rand((3, 3, 8, 8), 31, 0.2)  # min ch 8 < 16: stays bf16
        jaxpr_small = str(
            jax.make_jaxpr(
                lambda xx, ww: ops.bcos_conv2d(xx, ww, b=2, padding=1)
            )(xs, ws)
        )
        assert "i8" not in jaxpr_small
        y_small = ops.bcos_conv2d(xs, ws, b=2, padding=1)
        monkeypatch.setenv("BCOS_INT8", "0")
        y_exact = ops.bcos_conv2d(xs, ws, b=2, padding=1)
        np.testing.assert_array_equal(
            np.asarray(y_small, np.float32), np.asarray(y_exact, np.float32)
        )

        monkeypatch.setenv("BCOS_INT8", "1")
        xl = _rand((1, 6, 6, 16), 32)
        wl = _rand((3, 3, 16, 16), 33, 0.2)  # min ch 16 >= 16: quantizes
        jaxpr_large = str(
            jax.make_jaxpr(
                lambda xx, ww: ops.bcos_conv2d(xx, ww, b=2, padding=1)
            )(xl, wl)
        )
        assert "i8" in jaxpr_large

    def test_grouped_conv_per_group_depth_gates(self, monkeypatch):
        """The min-ch threshold measures PER-GROUP operand depth: a grouped
        conv with wide total channels but thin per-group contraction (the
        ResNeXt/depthwise regime, probe17's losing shape) must stay bf16
        under the default threshold, while the same-width dense conv
        quantizes (r5 review: min(total_in, total_out) misclassified
        grouped convs as wide)."""
        monkeypatch.setenv("BCOS_INT8", "1")  # default BCOS_INT8_MIN_CH=128
        monkeypatch.delenv("BCOS_INT8_MIN_CH", raising=False)
        x = _rand((1, 6, 6, 128), 40)
        w_grouped = _rand((3, 3, 4, 128), 41, 0.2)  # groups=32: depth 4
        jaxpr_g = str(
            jax.make_jaxpr(
                lambda xx, ww: ops._conv(xx, ww, 1, 1, 1, 32, allow_int8=True)
            )(x, w_grouped)
        )
        assert "i8" not in jaxpr_g
        w_dense = _rand((3, 3, 128, 128), 42, 0.2)  # groups=1: depth 128
        jaxpr_d = str(
            jax.make_jaxpr(
                lambda xx, ww: ops._conv(xx, ww, 1, 1, 1, 1, allow_int8=True)
            )(x, w_dense)
        )
        assert "i8" in jaxpr_d

    def test_epilogue_train_forward_never_quantized(self, monkeypatch):
        """bcos_conv1x1_bn_act must not quantize a train-mode forward even
        when called directly (r5 review: the contract was enforced only at
        a distant eval-only gate in models/resnet)."""
        monkeypatch.setenv("BCOS_INT8", "1")
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")
        x = _rand((2, 4, 4, 16), 43)
        w2 = _rand((16, 8), 44, 0.2)
        mult = jnp.ones((8,), jnp.float32)
        add = jnp.zeros((8,), jnp.float32)
        jaxpr_train = str(
            jax.make_jaxpr(
                lambda xx, ww: bcos_conv1x1_bn_act(
                    xx, ww, None, mult, add, relu=True, train=True
                )
            )(x, w2)
        )
        assert "i8" not in jaxpr_train
        jaxpr_serve = str(
            jax.make_jaxpr(
                lambda xx, ww: bcos_conv1x1_bn_act(
                    xx, ww, None, mult, add, relu=True
                )
            )(x, w2)
        )
        assert "i8" in jaxpr_serve

    def test_fp32_never_quantized(self, monkeypatch):
        monkeypatch.setenv("BCOS_INT8", "1")
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")  # tiny test convs must still quantize
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
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")  # tiny test convs must still quantize
        y_q = bcos_conv1x1_bn_act(x, w2, None, mult, add, relu=True)
        y_q_explain = bcos_conv1x1_bn_act(
            x, w2, None, mult, add, relu=True, explain=True
        )
        np.testing.assert_array_equal(
            np.asarray(y_q_explain, np.float32), np.asarray(y_ref, np.float32)
        )
        assert _rel_err(y_q, y_ref) < 0.05


class TestTrainingProtection:
    def test_train_forward_never_quantized(self, monkeypatch):
        # ADVICE r4 medium: allow_int8 must exclude train=True forwards —
        # the quantizer's round() has zero gradient, so a training step under
        # BCOS_INT8=1 would silently stop learning conv weights
        from bcosification_tpu.modules.bcos_layers import BcosConv2d, NormedConv2d

        monkeypatch.setenv("BCOS_INT8", "1")
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")  # tiny test convs must still quantize
        x = _rand((1, 6, 6, 4), 30)
        for mod in (
            BcosConv2d(features=8, kernel_size=3, padding=1),
            NormedConv2d(features=8, kernel_size=3, padding=1),
        ):
            var = mod.init(jax.random.PRNGKey(0), x)
            jaxpr_train = str(
                jax.make_jaxpr(lambda v, xx: mod.apply(v, xx, train=True))(var, x)
            )
            assert "i8" not in jaxpr_train
            jaxpr_serve = str(
                jax.make_jaxpr(lambda v, xx: mod.apply(v, xx, train=False))(var, x)
            )
            assert "i8" in jaxpr_serve  # the serving path still dispatches

    def test_grad_through_int8_raises(self, monkeypatch):
        # belt-and-braces: even if a call site mis-gates, differentiating the
        # quantized conv raises instead of returning silent zero gradients
        x = _rand((1, 6, 6, 8), 31)
        w = _rand((3, 3, 8, 8), 32, 0.2)

        def loss(ww):
            y = ops._conv_int8_dynamic(x, ww, 1, 1, 1, 1)
            return y.astype(jnp.float32).sum()

        with pytest.raises(RuntimeError, match="BCOS_INT8"):
            jax.grad(loss)(w)


class TestModuleLevel:
    def test_bcos_conv_module_explain_values_unaffected(self, monkeypatch):
        from bcosification_tpu.modules.bcos_layers import BcosConv2d

        mod = BcosConv2d(features=8, kernel_size=3, padding=1)
        x = _rand((1, 6, 6, 4), 15)
        var = mod.init(jax.random.PRNGKey(0), x)
        y_ref = mod.apply(var, x)
        monkeypatch.setenv("BCOS_INT8", "1")
        monkeypatch.setenv("BCOS_INT8_MIN_CH", "0")  # tiny test convs must still quantize
        y_q = mod.apply(var, x)
        y_q_explain = mod.apply(var, x, explain=True)
        np.testing.assert_array_equal(
            np.asarray(y_q_explain, np.float32), np.asarray(y_ref, np.float32)
        )
        assert _rel_err(y_q, y_ref) < 0.05
