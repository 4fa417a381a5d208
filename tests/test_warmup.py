"""Warmup modes: the full grid compile, and fast (two-phase) boot where
long-pool group prefills + rows decode variants compile in the background
while serving runs on the critical subset (engine/batcher.py warmup)."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.engine.batcher import BatchedEngine
from sonicscribe_tpu.engine.transcriber import Transcriber
from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import init_params
from sonicscribe_tpu.models.tokenizer import ByteTokenizer
from sonicscribe_tpu.vad.model import EnergyVad

SR = 16000


def _audio(seconds=0.4, f=300.0, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    x = 0.3 * np.sin(2 * np.pi * f * t)
    return (x + 0.01 * np.random.default_rng(seed).standard_normal(len(t))).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def stack():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
    return cfg, tr


def test_fast_warmup_defers_then_registers(stack):
    """fast=True: warmup returns with the critical subset compiled (B=1
    long prefills, full-rows decode); the deferred set lands via the
    background thread and registers in the compiled_* sets. Serving works
    BEFORE the background pass finishes (B=1 fallback), and token parity
    holds throughout."""
    cfg, tr = stack
    golden = tr.transcribe(_audio(), SR, max_new_tokens=8).tokens

    eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=16)
    try:
        eng.warmup(fast=True)
        # decode: full-rows (k, None) registered for every k; rows variants
        # are deferred (k >= 8 only)
        ks = {k for k, r in eng.long.compiled_decode if r is None}
        assert ks, "critical decode grid missing"
        # serving immediately (background may still be compiling)
        async def go():
            return await eng.transcribe(_audio(), SR, max_new_tokens=8)

        loop = asyncio.new_event_loop()
        r1 = loop.run_until_complete(go())
        np.testing.assert_array_equal(r1.tokens, golden)

        eng.warmup_join(timeout=300)
        assert eng.stats.get("warmup_background_pending", 0) == 0
        # deferred rows variants registered for the long pool
        rows_done = {r for k, r in eng.long.compiled_decode if r is not None}
        assert rows_done == set(eng.long.rows_ladder)
        # deferred B>1 long group prefills registered
        assert any(b > 1 for _, _, b in eng.long.compiled_ring_prefill)
        # and serving still parity-clean after the swap-in
        r2 = loop.run_until_complete(go())
        np.testing.assert_array_equal(r2.tokens, golden)
        loop.close()
    finally:
        eng.shutdown()


def test_fast_warmup_b1_admission_before_background(stack):
    """With the background pass suppressed, a multi-request final wave must
    still admit (as B=1 groups) — the scheduler's group-size pick is gated
    on compiled_ring_prefill."""
    cfg, tr = stack
    audios = [_audio(0.4, f=250 + 40 * i, seed=i) for i in range(4)]
    golden = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in audios]

    eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=16)
    try:
        eng.warmup(fast=True)
        # freeze the pre-background state: drop any B>1 registrations the
        # background thread may have already made
        eng.warmup_join(timeout=300)
        eng.long.compiled_ring_prefill = {
            t for t in eng.long.compiled_ring_prefill if t[2] == 1
        }
        eng.long.compiled_prefill = {
            t for t in eng.long.compiled_prefill if t[2] == 1
        }

        async def go():
            rs = await asyncio.gather(
                *[eng.transcribe(a, SR, max_new_tokens=8) for a in audios]
            )
            return [r.tokens for r in rs]

        loop = asyncio.new_event_loop()
        got = loop.run_until_complete(go())
        loop.close()
        for g, w in zip(got, golden):
            np.testing.assert_array_equal(g, w)
    finally:
        eng.shutdown()


def test_fast_warmup_pick_k_clamps_to_registered_rungs(stack):
    """fast=True defers the long pool's escalation rungs (k > live cap):
    until the background pass registers them, _pick_k must clamp to a
    compiled rung — a mid-serving JIT of a k=32 scan stalls every live
    session for seconds. After registration the escalation returns."""
    import time
    from types import SimpleNamespace

    cfg, tr = stack
    eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=200)
    try:
        eng.warmup(fast=True)
        # escalation rungs deferred at ready time
        ks0 = {k for k, r in eng.long.compiled_decode if r is None}
        assert ks0 and max(ks0) <= eng.long_live_k_cap, ks0
        # a confirmed long final with a big remaining budget during a quiet
        # window WANTS long_idle_k_cap, but must get a registered rung
        assert eng.alloc_stream() is not None  # live stream: k caps apply
        slot = eng.long.slots[0]
        slot.active = True
        slot.budget = 200
        slot.steps_seen = 0
        slot.request = SimpleNamespace(speculative=False, stream_idx=None)
        eng._last_short_admit = time.perf_counter() - 10.0
        k = eng._pick_k(eng.long)
        assert (k, None) in eng.long.compiled_decode, k
        assert k <= eng.long_live_k_cap
        eng.warmup_join(timeout=300)
        ks1 = {k for k, r in eng.long.compiled_decode if r is None}
        assert max(ks1) > eng.long_live_k_cap  # escalation rungs landed
        assert eng._pick_k(eng.long) == eng.long_idle_k_cap
        slot.active = False
        slot.request = None
    finally:
        eng.shutdown()


def test_fast_warmup_background_replay_drains_when_idle(stack):
    """fast=True leaves the execution-heavy long-pool replays (big-bucket
    prefills, k>=16 decode) in _replay_queue; serving works immediately,
    and the scheduler drains the queue in idle ticks."""
    cfg, tr = stack
    golden = tr.transcribe(_audio(), SR, max_new_tokens=8).tokens

    eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=16)
    try:
        eng.warmup(fast=True)
        queued = len(eng._replay_queue)
        assert queued > 0, "no replays were deferred to idle ticks"

        async def go():
            r = await eng.transcribe(_audio(), SR, max_new_tokens=8)
            # idle now: the scheduler should start draining the queue
            for _ in range(200):
                if not eng._replay_queue:
                    break
                await asyncio.sleep(0.05)
            return r

        loop = asyncio.new_event_loop()
        r = loop.run_until_complete(go())
        loop.close()
        np.testing.assert_array_equal(r.tokens, golden)
        assert not eng._replay_queue, (
            f"{len(eng._replay_queue)}/{queued} replays still queued"
        )
    finally:
        eng.shutdown()


def test_fast_warmup_queues_noncritical_replays_in_prio_order(stack):
    """r4 fast boot: EVERY non-critical compiled program's replay
    (server-side link + first run) queues instead of blocking ready —
    only VAD/scatter + the e2e exercise run inline (the r3 inline set was
    the whole 95.6 s restart tail, WARMUP_BENCH). drain_replays() brings
    the engine to steady state synchronously, and token parity holds
    before AND after the drain."""
    cfg, tr = stack
    golden = tr.transcribe(_audio(), SR, max_new_tokens=8).tokens

    eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=16)
    try:
        eng.warmup(fast=True)
        # the interim hot path (short-pool smallest ring prefill) must be
        # at the FRONT of the queue: it is what the first 64 ms-chunk
        # session dispatches
        assert len(eng._replay_queue) >= 4

        async def go():
            return await eng.transcribe(_audio(), SR, max_new_tokens=8)

        loop = asyncio.new_event_loop()
        r_before = loop.run_until_complete(go())
        np.testing.assert_array_equal(r_before.tokens, golden)
        eng.warmup_join()
        eng.drain_replays()
        assert not eng._replay_queue
        r_after = loop.run_until_complete(go())
        loop.close()
        np.testing.assert_array_equal(r_after.tokens, golden)
    finally:
        eng.shutdown()
