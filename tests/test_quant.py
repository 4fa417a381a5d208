"""INT8 weight-only quantization tests (reference capability: asr.py:148-210)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params, greedy_generate
from sonicscribe_tpu.ops.quant import (
    dequantize_tensor,
    is_qtensor,
    matmul,
    quantize_params_int8,
    quantize_tensor,
)


class TestQuantOps:
    def test_roundtrip_error_bounded(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
        q = quantize_tensor(w)
        assert q["q"].dtype == jnp.int8
        deq = dequantize_tensor(q)
        # max error is half a quantization step per column
        step = np.asarray(q["scale"])[0]
        assert np.all(np.abs(np.asarray(deq - w)) <= step * 0.5 + 1e-7)

    def test_matmul_quantized_close(self):
        k = jax.random.PRNGKey(1)
        x = jax.random.normal(k, (4, 64))
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 32)) * 0.05
        exact = np.asarray(x @ w)
        quant = np.asarray(matmul(x, quantize_tensor(w)))
        rel = np.abs(quant - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.02

    def test_matmul_w8a8_close_and_plain_passthrough(self):
        """Dynamic-activation int8 (native s8 MXU dot): small extra error on
        top of weight-only int8; plain arrays bypass quantization."""
        from sonicscribe_tpu.ops.quant import matmul_w8a8

        k = jax.random.PRNGKey(7)
        x = jax.random.normal(k, (4, 64), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(8), (64, 32)) * 0.05
        exact = np.asarray(
            x.astype(jnp.float32) @ w.astype(jnp.float32), np.float32
        )
        got = np.asarray(matmul_w8a8(x, quantize_tensor(w)), np.float32)
        rel = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.04
        assert matmul_w8a8(x, quantize_tensor(w)).dtype == x.dtype
        # 3-D activations (prefill shape) contract correctly too
        x3 = jax.random.normal(k, (2, 3, 64), jnp.bfloat16)
        got3 = np.asarray(matmul_w8a8(x3, quantize_tensor(w)), np.float32)
        ref3 = np.asarray(
            x3.astype(jnp.float32) @ w.astype(jnp.float32), np.float32
        )
        rel3 = np.abs(got3 - ref3).max() / (np.abs(ref3).max() + 1e-9)
        assert got3.shape == (2, 3, 32) and rel3 < 0.04
        np.testing.assert_allclose(
            np.asarray(matmul_w8a8(x, w.astype(jnp.bfloat16)), np.float32),
            np.asarray(x @ w.astype(jnp.bfloat16), np.float32),
        )

    def test_matmul_stacked_layer_slice(self):
        """scan slices q and scale together: simulate one slice."""
        w = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 8)) * 0.1
        qt = quantize_tensor(w)
        sliced = {"q": qt["q"][1], "scale": qt["scale"][1]}
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16))
        got = np.asarray(matmul(x, sliced))
        want = np.asarray(x @ dequantize_tensor({"q": qt["q"][1], "scale": qt["scale"][1]}))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestQuantizedModel:
    def test_skip_list_and_size(self):
        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        qp = quantize_params_int8(params)
        # skip-list parity with reference asr.py:176
        assert not is_qtensor(qp["decoder"]["embed"])
        assert not is_qtensor(qp["adapter"]["fc1"]["w"])
        assert is_qtensor(qp["decoder"]["layers"]["qkv_w"])
        assert is_qtensor(qp["encoder"]["layers"]["fc1_w"])
        # memory shrinks (int8 vs f32 on the projections)
        orig = sum(x.nbytes for x in jax.tree.leaves(params))
        quant = sum(x.nbytes for x in jax.tree.leaves(qp))
        assert quant < 0.55 * orig


    def test_decoder_only_mode(self):
        """int8-decoder: the encoder/adapter stay full precision (bf16
        prefill speed), only decoder projections quantize (decode
        bandwidth) - see quantize_params_int8 for the measured rationale."""
        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        qp = quantize_params_int8(params, decoder_only=True)
        assert is_qtensor(qp["decoder"]["layers"]["qkv_w"])
        assert is_qtensor(qp["decoder"]["layers"]["down_w"])
        assert not is_qtensor(qp["encoder"]["layers"]["fc1_w"])
        assert not is_qtensor(qp["encoder"]["layers"]["q_w"])
        assert not is_qtensor(qp["adapter"]["fc1"]["w"])
        # decoding still runs and is deterministic
        prompt = jax.random.normal(jax.random.PRNGKey(5), (1, 8, cfg.decoder.d_model)) * 0.1
        length = jnp.array([8])
        a = np.asarray(greedy_generate(qp, cfg, prompt, length, 6))
        b = np.asarray(greedy_generate(qp, cfg, prompt, length, 6))
        np.testing.assert_array_equal(a, b)

    def test_quantized_generation_runs_and_is_deterministic(self):
        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        qp = quantize_params_int8(params)
        prompt = jax.random.normal(jax.random.PRNGKey(5), (1, 8, cfg.decoder.d_model)) * 0.1
        length = jnp.array([8])
        a = np.asarray(greedy_generate(qp, cfg, prompt, length, 6))
        b = np.asarray(greedy_generate(qp, cfg, prompt, length, 6))
        np.testing.assert_array_equal(a, b)

    def test_act_int8_decode_close_to_w8a16(self):
        """cfg.act_int8_decode routes decode_step's projections through the
        native-s8 W8A8 dot (quant mode 'int8-decoder-a8'); logits stay close
        to the W8A16 int8 path and the flag leaves prefill untouched."""
        from dataclasses import replace

        from sonicscribe_tpu.models.glm_asr import (
            decode_step, init_cache, prefill,
        )

        cfg = tiny()
        cfg_a8 = replace(cfg, decoder=replace(cfg.decoder, act_int8_decode=True))
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        qp = quantize_params_int8(params, decoder_only=True)
        prompt = jax.random.normal(
            jax.random.PRNGKey(6), (2, 8, cfg.decoder.d_model)) * 0.1
        length = jnp.array([8, 8])
        cache, l16 = prefill(qp, cfg, prompt, length, init_cache(cfg, 2, 16, jnp.float32))
        cache8, l8 = prefill(qp, cfg_a8, prompt, length, init_cache(cfg, 2, 16, jnp.float32))
        # prefill is W8A16 in both modes: bit-identical
        np.testing.assert_array_equal(np.asarray(l16), np.asarray(l8))
        tok = jnp.argmax(l16, axis=-1).astype(jnp.int32)
        _, d16 = decode_step(qp, cfg, cache, tok)
        _, d8 = decode_step(qp, cfg_a8, cache8, tok)
        denom = np.abs(np.asarray(d16)).max() + 1e-9
        assert np.abs(np.asarray(d16 - d8)).max() / denom < 0.05

    def test_quantized_logits_close_to_fp(self):
        from sonicscribe_tpu.models.glm_asr import init_cache, prefill

        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        qp = quantize_params_int8(params)
        prompt = jax.random.normal(jax.random.PRNGKey(6), (1, 8, cfg.decoder.d_model)) * 0.1
        length = jnp.array([8])
        _, lf = prefill(params, cfg, prompt, length, init_cache(cfg, 1, 16, jnp.float32))
        _, lq = prefill(qp, cfg, prompt, length, init_cache(cfg, 1, 16, jnp.float32))
        denom = np.abs(np.asarray(lf)).max() + 1e-9
        assert np.abs(np.asarray(lf - lq)).max() / denom < 0.05


class TestInt8Pallas:
    """Fused dequant-matmul kernel (ops/int8_pallas.py): interpret-mode
    parity vs the XLA qtensor path. NOT wired into serving — measured
    slower than XLA's own fusion on chip (INT8_MATMUL_BENCH.json); kept
    as the baseline for hardware where the tradeoff flips."""

    @pytest.mark.parametrize(
        "b,k,n", [(1, 256, 384), (5, 128, 512), (16, 384, 128), (64, 256, 256)]
    )
    def test_bit_exact_vs_xla_path(self, b, k, n):
        from sonicscribe_tpu.ops.int8_pallas import int8_matmul, supported

        rng = np.random.default_rng(b)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16) * 0.1
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * 0.02
        qt = quantize_tensor(w)
        assert supported(x.shape, qt["q"].shape)
        ref = matmul(x, qt)
        got = int8_matmul(x, qt["q"], qt["scale"], interpret=True)
        assert got.dtype == x.dtype and got.shape == (b, n)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32)
        )

    def test_supported_gating(self):
        from sonicscribe_tpu.ops.int8_pallas import supported

        assert supported((8, 2048), (2048, 11008))  # gate_up (nano)
        assert supported((8, 5504), (5504, 2048))  # down (nano)
        assert not supported((2, 8, 128), (128, 128))  # 3-D prefill
        assert not supported((8, 100), (100, 128))  # unaligned K
        assert not supported((8, 128), (128, 100))  # unaligned N
