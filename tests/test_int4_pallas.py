"""ops/int4_pallas: packing roundtrip and interpret-mode kernel parity.

The kernels exist because plain XLA cannot exploit packed int4 on this
backend (INT4_MATMUL_BENCH: nibble unpack never fuses, native jnp.int4 dies
in lowering); on-chip perf lives in INT4_MATMUL_BENCH.json. Correctness is
checked here against a plain dequantized matmul of the same codes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.ops.int4_pallas import (
    int4_matmul,
    int4_matmul_stacked,
    int4_matmul_w4a8,
    int4_matmul_w4a8_stacked,
    pack_int4,
    supported,
    unpack_int4,
)


def _codes_and_scale(rng, k, n, layers=None):
    shp = (k, n) if layers is None else (layers, k, n)
    codes = jnp.asarray(rng.integers(-7, 8, shp), jnp.int8)
    sshape = (1, n) if layers is None else (layers, 1, n)
    scale = jnp.asarray(0.02 + 0.01 * rng.random(sshape), jnp.float32)
    return codes, scale


class TestPacking:
    @pytest.mark.parametrize("k,n", [(256, 128), (2048, 384)])
    def test_pack_unpack_roundtrip(self, k, n):
        rng = np.random.default_rng(0)
        codes, _ = _codes_and_scale(rng, k, n)
        packed = pack_int4(codes)
        assert packed.shape == (k // 2, n) and packed.dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(packed)), np.asarray(codes)
        )

    def test_negative_eight_survives(self):
        # -8 is a valid nibble code even though the quantizer emits [-7, 7]
        codes = jnp.full((4, 128), -8, jnp.int8)
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(pack_int4(codes))), np.asarray(codes)
        )


class TestW4A16:
    @pytest.mark.parametrize(
        "b,k,n", [(1, 256, 384), (5, 128, 512), (16, 384, 128)]
    )
    def test_matches_dequant_matmul(self, b, k, n):
        rng = np.random.default_rng(b)
        codes, scale = _codes_and_scale(rng, k, n)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16) * 0.1
        packed = pack_int4(codes)
        assert supported(x.shape, packed.shape)
        ref = (x @ codes.astype(x.dtype)) * scale.astype(x.dtype)
        got = int4_matmul(x, packed, scale, interpret=True)
        assert got.dtype == x.dtype and got.shape == (b, n)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(ref, np.float32),
            rtol=0.05,
            atol=1e-3,
        )

    def test_stacked_layer_slice(self):
        rng = np.random.default_rng(7)
        layers, b, k, n = 3, 4, 128, 256
        codes, scale = _codes_and_scale(rng, k, n, layers=layers)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16) * 0.1
        packed = pack_int4(codes)
        for l in range(layers):
            got = int4_matmul_stacked(x, packed, scale, l, interpret=True)
            want = int4_matmul(x, packed[l], scale[l], interpret=True)
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32)
            )


class TestW4A8:
    @pytest.mark.parametrize("b,k,n", [(1, 256, 384), (16, 384, 128)])
    def test_close_to_w4a16(self, b, k, n):
        rng = np.random.default_rng(b)
        codes, scale = _codes_and_scale(rng, k, n)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16) * 0.1
        packed = pack_int4(codes)
        ref = int4_matmul(x, packed, scale, interpret=True)
        got = int4_matmul_w4a8(x, packed, scale, interpret=True)
        assert got.dtype == x.dtype and got.shape == (b, n)
        denom = max(np.abs(np.asarray(ref, np.float32)).max(), 1e-6)
        assert np.abs(
            np.asarray(got, np.float32) - np.asarray(ref, np.float32)
        ).max() / denom < 0.05

    def test_stacked_layer_slice(self):
        rng = np.random.default_rng(9)
        layers, b, k, n = 2, 3, 256, 128
        codes, scale = _codes_and_scale(rng, k, n, layers=layers)
        x = jnp.asarray(rng.standard_normal((b, k)), jnp.bfloat16) * 0.1
        packed = pack_int4(codes)
        for l in range(layers):
            got = int4_matmul_w4a8_stacked(x, packed, scale, l, interpret=True)
            want = int4_matmul_w4a8(x, packed[l], scale[l], interpret=True)
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), np.asarray(want, np.float32)
            )


class TestSupported:
    def test_gating(self):
        assert supported((8, 2048), (1024, 11008))  # gate_up (nano)
        assert supported((8, 5504), (2752, 2048))  # down (nano)
        assert not supported((8, 2048), (2048, 11008))  # unpacked K
        assert not supported((2, 8, 128), (64, 128))  # 3-D prefill
        assert not supported((8, 128), (64, 100))  # unaligned N
