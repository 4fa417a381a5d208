"""Load-harness smoke: concurrent sessions through the batched engine (CPU)."""

import asyncio

import jax
import jax.numpy as jnp

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.engine.batcher import BatchedEngine
from sonicscribe_tpu.engine.transcriber import Transcriber
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.models.tokenizer import ByteTokenizer
from sonicscribe_tpu.tools.loadtest import run_load
from sonicscribe_tpu.vad.model import EnergyVad


def test_ring_capacity_fallback_to_host_path():
    """More sessions than device-ring stream rows: the overflow sessions run
    the host-audio path (stream_idx None) and must still produce committed
    results — graceful degradation at capacity, not an error."""
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    config = AppConfig()
    # ring capacity 2, but 4 concurrent sessions
    engine = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=64,
                           n_streams=2)

    async def go():
        return await run_load(engine, config, n_streams=4, seconds=6.0, realtime=False)

    metrics = asyncio.new_event_loop().run_until_complete(go())
    engine.shutdown()
    assert metrics["errors"] == 0, metrics
    assert metrics["committed_count"] >= 4, metrics  # all 4 sessions commit


def test_concurrent_streams_smoke():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    config = AppConfig()
    engine = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=64)

    async def go():
        return await run_load(engine, config, n_streams=4, seconds=6.0, realtime=False)

    metrics = asyncio.new_event_loop().run_until_complete(go())
    engine.shutdown()
    assert metrics["errors"] == 0
    # each stream speaks twice in 6 s (2.0 s speech / 1.5 s silence cycle);
    # at least the first utterance of each stream must commit
    assert metrics["committed_count"] >= 4, metrics
    assert metrics["interim_count"] >= 1, metrics
