"""Continuous batcher tests: token parity with the single-request engine,
concurrent-session correctness, slot reuse, batched VAD."""

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


def _audio(seconds, f=300.0, seed=None):
    t = np.arange(int(SR * seconds)) / SR
    x = 0.3 * np.sin(2 * np.pi * f * t)
    if seed is not None:
        x = x + 0.01 * np.random.default_rng(seed).standard_normal(len(t))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def stack():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    return cfg, tr


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


class TestBatcherParity:
    def test_single_request_token_parity(self, stack):
        cfg, tr = stack
        audio = _audio(0.5, seed=1)
        golden = tr.transcribe(audio, SR, max_new_tokens=10)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            try:
                return await eng.transcribe(audio, SR, max_new_tokens=10)
            finally:
                eng.shutdown()

        got = _run(go())
        np.testing.assert_array_equal(got.tokens, golden.tokens)
        assert got.text == golden.text

    def test_concurrent_requests_match_sequential(self, stack):
        """8 concurrent requests on 4 slots must each match the unbatched
        result token-for-token (slot reuse + batched decode correctness)."""
        cfg, tr = stack
        audios = [_audio(0.3 + 0.07 * i, f=200 + 60 * i, seed=i) for i in range(8)]
        golden = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in audios]

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            try:
                results = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in audios]
                )
                return [r.tokens for r in results], dict(eng.stats)
            finally:
                eng.shutdown()

        got, stats = _run(go())
        for i, (g, w) in enumerate(zip(got, golden)):
            np.testing.assert_array_equal(g, w, err_msg=f"request {i}")
        assert stats["prefills"] == 8

    @pytest.mark.parametrize("ration", [False, True])
    def test_ration_flag_token_parity(self, stack, ration):
        """Both legs of the admission-order A/B (combined admits — the
        default — and the rationed short-first order with mid-tick long
        admits) must produce token-exact results."""
        cfg, tr = stack
        audios = [_audio(0.3 + 0.07 * i, f=200 + 60 * i, seed=i) for i in range(6)]
        golden = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in audios]

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            eng.ration_long_admits = ration
            try:
                results = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in audios]
                )
                return [r.tokens for r in results]
            finally:
                eng.shutdown()

        got = _run(go())
        for i, (g, w) in enumerate(zip(got, golden)):
            np.testing.assert_array_equal(g, w, err_msg=f"request {i}")

    def test_hotword_bias_in_batch(self, stack):
        cfg, tr = stack
        strong = Transcriber(
            tr.cfg, tr.params, tr.tokenizer,
            prefill_buckets=(64, 128), hotword_bias_strength=1e9,
        )
        audio = _audio(0.4)
        zid = tr.tokenizer.encode("z")[0]

        async def go():
            eng = BatchedEngine(strong, EnergyVad(), slots=2, max_decode_tokens=16)
            try:
                r_biased, r_plain = await asyncio.gather(
                    eng.transcribe(audio, SR, max_new_tokens=4, hotwords=["z"]),
                    eng.transcribe(audio, SR, max_new_tokens=4),
                )
                return r_biased, r_plain
            finally:
                eng.shutdown()

        r_biased, r_plain = _run(go())
        assert all(t == zid for t in r_biased.tokens)
        assert not all(t == zid for t in r_plain.tokens)

    def test_batched_vad(self, stack):
        cfg, tr = stack

        def speech(sec):
            t = np.arange(int(SR * sec)) / SR
            env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
            return (0.25 * env * sum(np.sin(2 * np.pi * f * t) for f in (200, 700, 1500))).astype(np.float32)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2)
            try:
                win = 10240  # 640 ms gate window
                quiet = (0.0005 * np.random.default_rng(0).standard_normal(win)).astype(np.float32)
                # warm both streams' noise floors with a quiet window first
                (p0q, s0), (p1q, s1) = await asyncio.gather(
                    eng.vad_window_prob(quiet, None),
                    eng.vad_window_prob(quiet, None),
                )
                (p0, _), (p1, _) = await asyncio.gather(
                    eng.vad_window_prob(speech(0.64), s0),
                    eng.vad_window_prob(quiet, s1),
                )
                return p0, p1
            finally:
                eng.shutdown()

        p_speech, p_quiet = _run(go())
        assert p_speech > 0.7
        assert p_quiet < 0.4


class TestDualPoolDecode:
    def test_mixed_classes_fuse_and_match(self, stack):
        """Concurrent interim-class (short pool) + final-class (long pool)
        requests must decode through the FUSED dual-pool program (one weight
        stream per step, stats['dual_decodes'] > 0) and still match the
        unbatched engine token-for-token."""
        cfg, tr = stack
        shorts = [_audio(0.3, f=220 + 50 * i, seed=30 + i) for i in range(3)]
        longs = [_audio(0.6, f=400 + 80 * i, seed=40 + i) for i in range(2)]
        golden_s = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in shorts]
        # budget 24 > short_budget(16) routes these to the long pool
        golden_l = [tr.transcribe(a, SR, max_new_tokens=24).tokens for a in longs]

        async def go():
            eng = BatchedEngine(
                tr, EnergyVad(), slots=4, max_decode_tokens=32,
                fuse_dual_decode=True,
            )
            assert eng.fuse_dual
            try:
                rs = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in shorts],
                    *[eng.transcribe(a, SR, max_new_tokens=24) for a in longs],
                )
                return [r.tokens for r in rs], dict(eng.stats)
            finally:
                eng.shutdown()

        got, stats = _run(go())
        assert stats.get("dual_decodes", 0) > 0, stats
        for i, (g, w) in enumerate(zip(got[:3], golden_s)):
            np.testing.assert_array_equal(g, w, err_msg=f"short request {i}")
        for i, (g, w) in enumerate(zip(got[3:], golden_l)):
            np.testing.assert_array_equal(g, w, err_msg=f"long request {i}")


class TestPickK:
    def test_long_cap_applies_even_with_pending_backlog(self, stack):
        """Regression: the live long-pool k cap must apply INDEPENDENTLY of
        the pending-backlog cap — a sustained file job whose segments
        overflow the slot pool keeps the backlog non-empty, and the pending
        cap (16) alone would defeat the tuned cap (8) exactly in the
        sustained mixed-load scenario it exists for."""
        cfg, tr = stack
        eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=64)
        try:
            s = eng.alloc_stream()  # realtime streams live
            slot = eng.long.slots[0]
            slot.active = True
            slot.budget = 64
            slot.steps_seen = 0
            # with an interim in flight the strict live cap applies...
            short_slot = eng.short.slots[0]
            short_slot.active = True
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap  # no backlog
            eng._host_backlog.append(object())  # sustained backlog
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap
            eng._host_backlog.clear()
            # ...and with the short pool idle the long pool may take the
            # bigger idle cap (finals ride the silence phase), but no more
            short_slot.active = False
            assert eng.long_live_k_cap < eng._pick_k(eng.long) <= eng.long_idle_k_cap
            # the pending cap is ALSO skipped when the only waiting work is
            # long-class (it is sped up, not delayed, by a bigger k)...
            eng._host_backlog.append(object())
            eng._backlog_has_short = False
            assert eng._pick_k(eng.long) > eng.pending_k_cap
            # ...but not when a short-class request waits
            eng._backlog_has_short = True
            assert eng._pick_k(eng.long) <= eng.pending_k_cap
            eng._backlog_has_short = False
            eng._host_backlog.clear()
            slot.active = False
            eng.free_stream(s)
        finally:
            eng.shutdown()

    def test_long_cap_escalates_when_streams_outnumber_long_slots(self, stack):
        """The oversubscribed regime (live streams > long slots) with a
        slack short class takes the bigger long_oversub_k_cap: final waves
        queue for slots there, and k=16 restored the 100-stream committed
        collapse with interims unchanged (SCALE_BENCH knee_100 vs
        remedy_k16_100). Below the stream threshold — or while the short
        class is queueing (the mixed-load file-burst regime, MIXED_BENCH) —
        the mixed-load-tuned live cap (8) still applies."""
        cfg, tr = stack
        eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=64)
        try:
            slot = eng.long.slots[0]
            slot.active = True
            slot.budget = 64
            slot.steps_seen = 0
            short_slot = eng.short.slots[0]
            short_slot.active = True  # interims in flight: live caps apply
            eng.short_queue_ema = 0.0  # short class healthy (measured slack)
            streams = [eng.alloc_stream(), eng.alloc_stream()]
            # live == long slots: NOT oversubscribed, strict live cap
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap
            streams.append(eng.alloc_stream())
            # live (3) > long slots (2) + slack: escalated cap, no further
            k = eng._pick_k(eng.long)
            assert eng.long_live_k_cap < k <= eng.long_oversub_k_cap
            # no escalation while the short class is queueing (EMA above
            # the eager budget — the boot default is also above it, so a
            # fresh engine must earn the escalation with healthy interims)
            eng.short_queue_ema = 2.0 * eng.eager_queue_budget_ms
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap
            eng.short_queue_ema = 0.0
            # the escalated cap still yields to a waiting short request
            eng._host_backlog.append(object())
            eng._backlog_has_short = True
            assert eng._pick_k(eng.long) <= eng.pending_k_cap
            eng._backlog_has_short = False
            eng._host_backlog.clear()
            for s in streams:
                eng.free_stream(s)
            slot.active = False
            short_slot.active = False
        finally:
            eng.shutdown()


class TestGroupedFinalPrefill:
    def test_final_wave_admits_as_one_group(self, stack):
        """A synchronized wave of finals at a big chunk bucket must admit
        through ONE grouped prefill program when the group size is compiled
        (COMMIT_LATENCY_BENCH lever: B=1 prefill waves were the dominant
        committed-latency term), token-identical to solo requests."""
        import time as _time

        from sonicscribe_tpu.engine.batcher import _RingTranscribeReq

        cfg, tr = stack

        async def go():
            eng = BatchedEngine(
                tr, EnergyVad(), slots=8, max_decode_tokens=64, n_streams=8
            )
            try:
                big_cb = max(eng.chunk_buckets)
                sb0 = eng.suffix_buckets[0]
                # what default warmup registers for the long pool (grid_choices)
                eng.long.compiled_ring_prefill.update(
                    {(big_cb, sb0, 4), (big_cb, sb0, 8)}
                )
                await eng.start()
                loop = asyncio.get_running_loop()
                futs = []
                for s in [eng.alloc_stream() for _ in range(8)]:
                    fut = loop.create_future()
                    await eng._ring_requests.put(
                        _RingTranscribeReq(
                            s, 0, big_cb, 20, None, 1.0, fut, _time.perf_counter()
                        )
                    )
                    futs.append(fut)
                eng._wake.set()
                results = await asyncio.gather(*futs)
                return [r.tokens for r in results], dict(eng.stats)
            finally:
                eng.shutdown()

        tokens, stats = _run(go())
        assert stats["prefills"] == 8
        assert stats["prefill_programs"] == 1  # one B=8 program, not 8x B=1
        # all 8 decoded rows are real results (same ring content -> same tokens)
        for t in tokens[1:]:
            np.testing.assert_array_equal(t, tokens[0])


class TestBusyAdmissionPacing:
    def test_long_admissions_paced_while_short_busy(self, stack):
        """While the short class is busy, a long-class burst admits at most
        busy_long_admit_cap per tick (bounds per-tick host-prep + prefill
        work, the mixed-workload interim-tail term); when quiet, the rest
        admits freely."""
        import time as _time

        from sonicscribe_tpu.engine.batcher import _RingTranscribeReq

        cfg, tr = stack

        async def go():
            eng = BatchedEngine(
                tr, EnergyVad(), slots=8, max_decode_tokens=64, n_streams=8
            )
            try:
                streams = [eng.alloc_stream() for _ in range(5)]
                loop = asyncio.get_running_loop()
                futs = []
                for s in streams:
                    fut = loop.create_future()
                    eng._ring_backlog.append(
                        _RingTranscribeReq(
                            s, 0, 1, 20, None, 1.0, fut, _time.perf_counter()
                        )
                    )
                    futs.append(fut)
                # short class BUSY: an admission just happened
                eng._last_short_admit = _time.perf_counter()
                eng._admit_backlogs()
                paced_active = eng.long.n_active
                paced_kept = len(eng._ring_backlog)
                # short class QUIET: the rest admits in one go
                eng._last_short_admit = 0.0
                eng._admit_backlogs()
                rest_active = eng.long.n_active
                # drain so shutdown doesn't fail pending futures loudly
                await eng.start()
                await asyncio.gather(*futs)
                return paced_active, paced_kept, rest_active
            finally:
                eng.shutdown()

        paced_active, paced_kept, rest_active = _run(go())
        assert paced_active == 2  # busy_long_admit_cap
        assert paced_kept == 3
        assert rest_active == 5


class TestVadBurstOver64:
    def test_ring_vad_burst_over_largest_bucket(self, stack):
        """A lockstep gate-window burst from >64 streams must split across
        multiple VAD programs, not crash the scheduler (regression: 100
        realtime streams raised StopIteration in _dispatch_vad_ring)."""
        cfg, tr = stack

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2, n_streams=80)
            try:
                streams = [eng.alloc_stream() for _ in range(70)]
                assert all(s is not None for s in streams)
                rng = np.random.default_rng(0)
                pcm = (rng.standard_normal(1024) * 3000).astype("<i2").tobytes()
                for s in streams:
                    for c in range(10):  # one 640 ms gate window
                        eng.ingest(s, c, pcm)
                probs = await asyncio.gather(
                    *[eng.vad_window_ring(s, 0) for s in streams]
                )
                for s in streams:
                    eng.free_stream(s)
                return probs
            finally:
                eng.shutdown()

        probs = _run(go())
        assert len(probs) == 70
        assert all(0.0 <= p <= 1.0 for p in probs)

    def test_host_vad_burst_over_largest_bucket(self, stack):
        """Same overflow guard on the host-audio VAD path."""
        cfg, tr = stack
        win = (0.1 * np.random.default_rng(1).standard_normal(10240)).astype(
            np.float32
        )

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2)
            try:
                return await asyncio.gather(
                    *[eng.vad_window_prob(win, None) for _ in range(70)]
                )
            finally:
                eng.shutdown()

        results = _run(go())
        assert len(results) == 70
        assert all(0.0 <= p <= 1.0 for p, _state in results)


class TestSlotReuse:
    def test_sequential_waves_no_stale_reap(self, stack):
        """Slot reuse across back-to-back request waves: a slot freed and
        re-admitted one tick later must NOT be finished by the previous
        request's parked (pipelined) status row — regression for a race where
        wave-2 requests resolved instantly with wave-1's tokens."""
        cfg, tr = stack
        wave_a = [_audio(0.3, f=200 + 40 * i, seed=10 + i) for i in range(4)]
        wave_b = [_audio(0.45, f=500 + 35 * i, seed=20 + i) for i in range(4)]
        golden_b = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in wave_b]

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            try:
                await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in wave_a]
                )
                rb = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in wave_b]
                )
                return [r.tokens for r in rb]
            finally:
                eng.shutdown()

        got_b = _run(go())
        for i, (g, w) in enumerate(zip(got_b, golden_b)):
            np.testing.assert_array_equal(g, w, err_msg=f"wave-2 request {i}")

    def test_rows_prefix_decode_parity(self, stack):
        """Occupied-prefix decode (rows_ladder): a small wave decodes through
        the rows=4 program, a full wave through rows=8/full — token parity
        with the unbatched path must hold for both, and _pick_rows must pick
        the smallest covering prefix."""
        cfg, tr = stack
        small = [_audio(0.3, f=220 + 50 * i, seed=30 + i) for i in range(2)]
        big = [_audio(0.4, f=400 + 30 * i, seed=40 + i) for i in range(8)]
        golden = [
            tr.transcribe(a, SR, max_new_tokens=8).tokens for a in small + big
        ]

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=32)
            try:
                assert eng.long.rows_ladder == (1, 4)
                # unit check of the prefix pick on synthetic occupancy
                # (_pick_rows is gated on registered programs)
                eng.long.compiled_decode |= {(8, 1), (8, 4), (8, None)}
                for i in range(len(eng.long.slots)):
                    eng.long.slots[i].active = i == 0
                assert eng._pick_rows(eng.long, 8) == 1
                assert eng._pick_rows(eng.long, 2) is None  # unregistered k
                eng.long.slots[2].active = True
                assert eng._pick_rows(eng.long, 8) == 4
                eng.long.slots[5].active = True
                assert eng._pick_rows(eng.long, 8) is None  # past the ladder
                for s in eng.long.slots:
                    s.active = False
                assert eng._pick_rows(eng.short, 8) is None  # short: no ladder

                ra = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in small]
                )
                rb = await asyncio.gather(
                    *[eng.transcribe(a, SR, max_new_tokens=8) for a in big]
                )
                return [r.tokens for r in ra + rb]
            finally:
                eng.shutdown()

        got = _run(go())
        for i, (g, w) in enumerate(zip(got, golden)):
            np.testing.assert_array_equal(g, w, err_msg=f"request {i}")


class TestBaseLogitBias:
    def test_base_bias_applies_and_hotwords_stack(self, stack):
        """base_logit_bias reaches every slot's decode; hotword boosts stack
        on top of it (and clean-slot resets restore the base, not zero)."""
        import jax.numpy as jnp

        cfg, tr = stack
        audio = _audio(0.4, seed=9)
        qid = tr.tokenizer.encode("q")[0]
        base = np.zeros((cfg.decoder.vocab_size,), np.float32)
        base[qid] = 1e9  # the base bias forces token 'q' everywhere
        strong = Transcriber(
            tr.cfg, tr.params, tr.tokenizer,
            prefill_buckets=(64, 128), hotword_bias_strength=1e12,
        )
        zid = tr.tokenizer.encode("z")[0]

        async def go():
            eng = BatchedEngine(
                strong, EnergyVad(), slots=2, max_decode_tokens=16,
                base_logit_bias=base,
            )
            try:
                r_hot = await eng.transcribe(
                    audio, SR, max_new_tokens=4, hotwords=["z"]
                )
                r_plain = await eng.transcribe(audio, SR, max_new_tokens=4)
                # second plain request reuses a slot whose bias row was
                # hotword-dirty: it must reset to the BASE bias, not zero
                r_plain2 = await eng.transcribe(audio, SR, max_new_tokens=4)
                return r_hot, r_plain, r_plain2
            finally:
                eng.shutdown()

        r_hot, r_plain, r_plain2 = _run(go())
        assert all(t == zid for t in r_hot.tokens)  # hotword beats base
        assert all(t == qid for t in r_plain.tokens)  # base bias active
        assert all(t == qid for t in r_plain2.tokens)  # reset -> base


class TestFusedSlotWrites:
    def test_token_parity_with_fused_writes(self, stack):
        """fuse_slot_writes must be behavior-identical: same tokens for
        plain, hotword-biased, and drafted requests whether the per-slot
        budget/draft state lands via 4 eager dispatches or the fused
        program (_slot_write_program)."""
        cfg, tr = stack
        audio = _audio(0.5, seed=3)

        async def run_engine(fused):
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            eng.fuse_slot_writes = fused
            try:
                plain = await eng.transcribe(audio, SR, max_new_tokens=10)
                hot = await eng.transcribe(
                    audio, SR, max_new_tokens=10, hotwords=["jax"]
                )
                # drafted final through the verify path: golden draft
                eng.spec_accept_ema = 1.0
                drafted = await eng.transcribe(
                    audio, SR, max_new_tokens=10,
                    draft_tokens=plain.tokens,
                )
                # wave: fills multiple slots in one group (padded B)
                wave = await asyncio.gather(*[
                    eng.transcribe(audio, SR, max_new_tokens=8)
                    for _ in range(3)
                ])
                return plain.tokens, hot.tokens, drafted.tokens, [
                    r.tokens for r in wave
                ]
            finally:
                eng.shutdown()

        p0, h0, d0, w0 = _run(run_engine(False))
        p1, h1, d1, w1 = _run(run_engine(True))
        np.testing.assert_array_equal(p0, p1)
        np.testing.assert_array_equal(h0, h1)
        np.testing.assert_array_equal(d0, d1)
        for a, b in zip(w0, w1):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(p0, d0)  # draft path is lossless


class TestStallAbort:
    def test_wedged_tick_crashes_engine_and_fails_futures(self, stack):
        """A tick hung past tick_stall_abort_s (a wedged device runtime,
        observed r4) must crash the scheduler and FAIL in-flight futures
        instead of hanging every caller forever."""
        import time as _time

        cfg, tr = stack
        audio = _audio(0.3, seed=7)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=16)
            eng.tick_stall_dump_s = 0.1
            eng.tick_stall_abort_s = 0.3
            eng._tick = lambda *_a, **_k: _time.sleep(3.0)  # wedge
            fut = asyncio.ensure_future(
                eng.transcribe(audio, SR, max_new_tokens=4)
            )
            try:
                await asyncio.wait_for(fut, timeout=10.0)
                return "completed"
            except RuntimeError:
                await asyncio.sleep(0)  # let the scheduler task finish
                assert eng.alive is False  # /health reports degraded
                return "failed"
            except asyncio.TimeoutError:
                return "hung"
            finally:
                eng.shutdown()

        assert _run(go()) == "failed"

    def test_start_restarts_after_crash(self, stack):
        """After a scheduler crash, the next transcribe() must spawn a
        fresh scheduler (the crashed task can't serve the queue — without
        the restart branch in start() the request would enqueue against
        nobody and hang) and a successful restart clears the crash flag so
        /health reports the NEW scheduler's state."""
        import time as _time

        cfg, tr = stack
        audio = _audio(0.3, seed=7)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=16)
            eng.tick_stall_dump_s = 0.1
            eng.tick_stall_abort_s = 0.3
            real_tick = eng._tick
            eng._tick = lambda *_a, **_k: _time.sleep(3.0)  # wedge
            try:
                # two concurrent requests: the first is admitted and fails
                # via the slot sweep; the second is still sitting in the
                # intake queue when the crash lands and must be failed by
                # the queue drain (not silently orphaned by the restart's
                # queue recreation — callers would hang forever)
                f1 = asyncio.ensure_future(
                    eng.transcribe(audio, SR, max_new_tokens=4)
                )
                await asyncio.sleep(0.05)
                f2 = asyncio.ensure_future(
                    eng.transcribe(audio, SR, max_new_tokens=4)
                )
                r1, r2 = await asyncio.gather(
                    asyncio.wait_for(f1, 15), asyncio.wait_for(f2, 15),
                    return_exceptions=True,
                )
                assert isinstance(r1, RuntimeError), r1
                assert isinstance(r2, RuntimeError), r2  # queued: must fail
                await asyncio.sleep(0)  # let the crashed task finish
                assert eng.alive is False
                # while the wedged tick thread is still stuck, restart must
                # refuse (a new scheduler would race it on pool state)
                if eng._tick_busy:
                    with pytest.raises(RuntimeError, match="still"):
                        await eng.start()
                for _ in range(200):  # wait for the stuck thread to drain
                    if not eng._tick_busy:
                        break
                    await asyncio.sleep(0.05)
                assert not eng._tick_busy
                eng._tick = real_tick  # "device recovered"
                # restore real thresholds: the fresh scheduler's first tick
                # compiles for seconds and must not trip the test's abort
                eng.tick_stall_dump_s = 60.0
                eng.tick_stall_abort_s = 600.0
                res = await eng.transcribe(audio, SR, max_new_tokens=4)
                assert res.tokens is not None
                assert eng.alive is True  # restart cleared the crash flag
            finally:
                eng.shutdown()

        _run(go())

    def test_graceful_shutdown_is_not_degraded(self, stack):
        """alive must stay True after a clean stop: /health's 'degraded'
        state means a wedged-device crash needing a supervisor restart,
        and a graceful shutdown must be distinguishable from it."""
        cfg, tr = stack
        audio = _audio(0.3, seed=7)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=16)
            await eng.transcribe(audio, SR, max_new_tokens=4)
            assert eng.alive is True
            eng.shutdown()
            await asyncio.sleep(0.05)  # let the scheduler task wind down
            assert eng.alive is True  # stopped, not crashed

        _run(go())


class TestShutdownCleanliness:
    def test_shutdown_fails_inflight_requests(self, stack):
        """Stopping the engine with requests in flight must FAIL their
        futures (not leave callers hanging on never-resolved awaits)."""
        cfg, tr = stack
        audio = _audio(0.5, seed=42)

        async def go():
            # same shapes as TestBatcherParity so programs are already
            # compiled — otherwise the first tick sits in an XLA compile and
            # cancellation can't land inside the wait window
            eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)
            await eng.transcribe(audio, SR, max_new_tokens=32)  # warm: compiles every program the measured request needs
            fut = asyncio.ensure_future(
                eng.transcribe(audio, SR, max_new_tokens=32)
            )
            # let the scheduler admit + dispatch at least one tick
            await asyncio.sleep(0.05)
            eng.shutdown()
            try:
                await asyncio.wait_for(fut, timeout=30.0)
                return "completed"  # raced to completion before stop: fine
            except RuntimeError:
                return "failed"  # cleanly failed: fine
            except asyncio.TimeoutError:
                return "hung"

        outcome = _run(go())
        assert outcome in ("completed", "failed"), outcome


class TestInterimStagger:
    """Per-stream interim-cadence phases (SCALE_BENCH r4: lockstep cohorts
    admitted every interim wave as one short-pool-oversubscribing burst)."""

    def test_zero_for_small_cohorts_and_spread_for_big(self, stack):
        _cfg, tr = stack
        eng = BatchedEngine(
            tr, EnergyVad(), slots=4, max_decode_tokens=32, n_streams=4
        )
        try:
            a = eng.alloc_stream()
            # one live stream on a 4-slot short pool: no stagger, no UX cost
            assert eng.interim_stagger(a) == 0.0
            assert eng.interim_stagger(None) == 0.0
            claimed = [eng.alloc_stream() for _ in range(3)]
            # cohort can fill half the short pool in one wave: phases spread
            offs = {eng.interim_stagger(i) for i in [a, *claimed]}
            assert len(offs) > 1
            assert all(0.0 <= o < 1.0 for o in offs)
            for i in [a, *claimed]:
                eng.free_stream(i)
        finally:
            eng.shutdown()

    def test_stagger_flag_off_disables_phases(self, stack):
        """stagger_interims=False (the bench A/B leg) forces phase 0 even
        for pool-filling cohorts."""
        _cfg, tr = stack
        eng = BatchedEngine(
            tr, EnergyVad(), slots=4, max_decode_tokens=32, n_streams=4
        )
        try:
            claimed = [eng.alloc_stream() for _ in range(4)]
            eng.stagger_interims = False
            assert all(eng.interim_stagger(i) == 0.0 for i in claimed)
            for i in claimed:
                eng.free_stream(i)
        finally:
            eng.shutdown()

    def test_session_reanchors_cadence_with_stagger(self, stack):
        """At speech start the session pushes its next interim out by the
        engine's phase; a fake clock drives the cadence check directly."""
        from sonicscribe_tpu.config import AppConfig
        from sonicscribe_tpu.serve.session import StreamSession

        class Eng:
            has_ring = False

            def interim_stagger(self, _idx):
                return 0.5

        sent = []

        async def send(msg):
            sent.append(msg)

        t = [100.0]
        s = StreamSession("c1", AppConfig(), Eng(), send, clock=lambda: t[0])
        s._last_interim_t = t[0] + s._interim_stagger()
        # inside the staggered window: cadence check must refuse
        t[0] += 1.2
        assert t[0] - s._last_interim_t < 1.0
        # past it: eligible
        t[0] += 0.5
        assert t[0] - s._last_interim_t >= 1.0
