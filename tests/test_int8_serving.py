"""INT8-quantized model through the full serving stack (batcher + ring)."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.engine.batcher import BatchedEngine
from sonicscribe_tpu.engine.transcriber import Transcriber
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.models.tokenizer import ByteTokenizer
from sonicscribe_tpu.ops.quant import quantize_params_int8
from sonicscribe_tpu.vad.model import EnergyVad

SR = 16000


def test_int8_batched_engine_end_to_end():
    cfg = tiny()
    params = quantize_params_int8(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    engine = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=32)
    # cache must not be int8
    assert engine.cache_k.dtype != jnp.int8

    t = np.arange(8000) / SR
    audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    async def go():
        r1, r2 = await asyncio.gather(
            engine.transcribe(audio, SR, max_new_tokens=8),
            engine.transcribe(audio, SR, max_new_tokens=8),
        )
        # ring path too
        idx = engine.alloc_stream()
        for c in range(20):
            engine.ingest(idx, c, audio[c * 1024 : (c + 1) * 1024].tobytes())
        prob = await engine.vad_window_ring(idx, 0)
        r3 = await engine.transcribe_ring(idx, 0, 12, max_new_tokens=8)
        engine.free_stream(idx)
        return r1, r2, prob, r3

    r1, r2, prob, r3 = asyncio.new_event_loop().run_until_complete(go())
    engine.shutdown()
    np.testing.assert_array_equal(r1.tokens, r2.tokens)  # deterministic
    assert 0.0 <= prob <= 1.0
    assert isinstance(r3.text, str)
