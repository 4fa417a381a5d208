"""Eager (speculative-endpoint) finals.

The gate confirms a speech end only at the SECOND consecutive silent window
(reference vad_processor_manager.py:154 semantics), so the final's audio is
fully buffered one 640 ms window before confirmation. With
config.eager_finals the session launches the final decode at the FIRST
silent window and commits its result on confirmation; a speech resume
discards (cancels) the speculation, and the engine frees the cancelled
request's slot.
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.engine.transcriber import TranscribeResult
from sonicscribe_tpu.serve.session import StreamSession
from sonicscribe_tpu.vad.gate import VadGate, VadGateConfig

SR = 16000
CHUNK = 1024


# ---------------------------------------------------------------------------
# gate events
# ---------------------------------------------------------------------------


class TestGateEvents:
    def _speaking_gate(self):
        g = VadGate(VadGateConfig())
        ev = g.update(1.0, 0, 9)
        assert g.is_speaking and ev.speech_start_chunk == 0
        return g

    def test_first_silent_window_fires_maybe_end(self):
        g = self._speaking_gate()
        ev = g.update(0.0, 10, 19)
        assert ev.maybe_end_chunk == 19
        assert not ev.state_changed and g.is_speaking

    def test_second_silent_window_confirms_without_maybe_end(self):
        g = self._speaking_gate()
        g.update(0.0, 10, 19)
        ev = g.update(0.0, 20, 29)
        assert ev.maybe_end_chunk is None
        assert ev.state_changed and ev.speech_end_chunk == 29

    def test_resume_after_one_silent_window(self):
        g = self._speaking_gate()
        g.update(0.0, 10, 19)
        ev = g.update(1.0, 20, 29)
        assert ev.resumed and g.is_speaking
        # a later pause fires maybe_end again
        ev = g.update(0.0, 30, 39)
        assert ev.maybe_end_chunk == 39 and not ev.resumed

    def test_no_maybe_end_outside_speech(self):
        g = VadGate(VadGateConfig())
        ev = g.update(0.0, 0, 9)
        assert ev.maybe_end_chunk is None and not ev.resumed

    def test_no_maybe_end_with_smoothing_window_one(self):
        # smoothing_window=1: the first silent window IS the confirmed end
        g = VadGate(VadGateConfig(smoothing_window=1))
        g.update(1.0, 0, 9)
        ev = g.update(0.0, 10, 19)
        assert ev.maybe_end_chunk is None
        assert ev.state_changed and ev.speech_end_chunk == 19


# ---------------------------------------------------------------------------
# session flow (fake engine)
# ---------------------------------------------------------------------------


class RecordingEngine:
    """Energy VAD + recorded transcribe calls; decodes take decode_delay_s so
    an eager decode is still in flight at confirmation/resume time."""

    has_ring = False

    def __init__(self, decode_delay_s: float = 0.05):
        self.decode_delay_s = decode_delay_s
        self.calls = []  # (start_id, end_id, max_new_tokens)
        self.cancelled = 0

    async def vad_window_prob(self, audio, state):
        rms = float(np.sqrt(np.mean(audio**2))) if len(audio) else 0.0
        return (1.0 if rms > 0.01 else 0.0), None

    async def transcribe(
        self, audio, sample_rate, max_new_tokens, hotwords=None,
        speculative=False,
    ):
        n = len(self.calls)
        self.calls.append((len(audio), max_new_tokens))
        try:
            await asyncio.sleep(self.decode_delay_s)
        except asyncio.CancelledError:
            self.cancelled += 1
            raise
        return TranscribeResult(
            text=f"text{n}",
            tokens=np.arange(3, dtype=np.int32),
            audio_duration_s=len(audio) / sample_rate,
            timings={},
        )


def _chunks(loud: bool, n: int) -> list[bytes]:
    t = np.arange(CHUNK) / SR
    amp = 0.3 if loud else 0.0002
    x = (amp * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    return [x.tobytes()] * n


async def _feed(s, spec):
    for loud, windows in spec:
        for chunk in _chunks(loud, windows * 10):
            await s.on_audio(chunk)
        # pacing between phases so a just-launched eager task actually
        # starts (realtime gives it a full window period)
        await s.flush_vad()
        await asyncio.sleep(0.02)
    await s.flush_vad()
    await asyncio.sleep(0.05)  # let the last window's gate update land


class TestSessionEagerFinals:
    async def test_eager_final_commits_on_confirmation(self):
        cfg = AppConfig()
        assert cfg.eager_finals  # production default
        msgs = []

        async def send(m):
            msgs.append(m)

        eng = RecordingEngine()
        s = StreamSession("c", cfg, eng, send)
        # 2 loud windows (speech), then 2 silent (maybe_end -> confirm)
        await _feed(s, [(True, 2), (False, 2)])
        await s.flush()
        await s.cleanup()

        committed = [m for m in msgs if m["type"] == "committed_output"]
        assert len(committed) == 1
        # exactly ONE final-class decode ran: the eager one, over the audio
        # up to the FIRST silent window (3 windows = 30 chunks); the
        # confirmed message still spans the full gate range (4 windows)
        finals = [c for c in eng.calls if c[1] > cfg.interim_max_new_tokens]
        assert len(finals) == 1
        assert finals[0][0] == 30 * CHUNK
        assert committed[0]["end_chunk_id"] == 39
        assert committed[0]["text"] == f"text{len(eng.calls) - 1}"
        assert eng.cancelled == 0

    async def test_resume_cancels_eager_then_recommits_full_segment(self):
        cfg = AppConfig()
        msgs = []

        async def send(m):
            msgs.append(m)

        eng = RecordingEngine(decode_delay_s=0.2)
        s = StreamSession("c", cfg, eng, send)
        # speech, one silent window (eager), speech resumes (cancel),
        # then two silent windows (eager again -> confirm)
        await _feed(s, [(True, 2), (False, 1), (True, 2), (False, 2)])
        await s.flush()
        await s.cleanup()

        committed = [m for m in msgs if m["type"] == "committed_output"]
        assert len(committed) == 1
        assert eng.cancelled == 1  # the discarded first speculation
        # the committed final covers the whole segment (7 windows of audio
        # up to the second eager's maybe_end)
        finals = [c for c in eng.calls if c[1] > cfg.interim_max_new_tokens]
        assert finals[-1][0] == 60 * CHUNK
        assert committed[0]["end_chunk_id"] == 69

    async def test_flag_off_single_plain_final(self):
        cfg = AppConfig()
        cfg.eager_finals = False
        msgs = []

        async def send(m):
            msgs.append(m)

        eng = RecordingEngine()
        s = StreamSession("c", cfg, eng, send)
        await _feed(s, [(True, 2), (False, 2)])
        await s.flush()
        await s.cleanup()

        committed = [m for m in msgs if m["type"] == "committed_output"]
        assert len(committed) == 1
        # plain path: the final covers the full confirmed range (4 windows)
        finals = [c for c in eng.calls if c[1] > cfg.interim_max_new_tokens]
        assert len(finals) == 1
        assert finals[0][0] == 40 * CHUNK

    async def test_outcomes_reported_to_engine_gate(self):
        """The engine's adaptive launch gate feeds on session-reported bet
        outcomes: a resume reports False, a confirmed commit reports True."""
        cfg = AppConfig()
        outcomes = []

        async def send(m):
            pass

        eng = RecordingEngine(decode_delay_s=0.2)
        eng.eager_ok = lambda: True
        eng.eager_outcome = outcomes.append
        s = StreamSession("c", cfg, eng, send)
        # speech, one silent window (eager #1), resume (lost bet), then
        # two silent windows (eager #2 -> confirmed)
        await _feed(s, [(True, 2), (False, 1), (True, 2), (False, 2)])
        await s.flush()
        await s.cleanup()
        assert outcomes == [False, True]

    async def test_gated_off_launch_falls_back_to_interim_cadence(self):
        """When the engine gate refuses the launch, the maybe_end window
        must still serve the interim cadence instead of going dark."""
        cfg = AppConfig()
        msgs = []

        async def send(m):
            msgs.append(m)

        eng = RecordingEngine()
        eng.eager_ok = lambda: False
        s = StreamSession("c", cfg, eng, send)
        clock = [0.0]
        s.clock = lambda: clock[0]
        # long speech run, then a silent window with the interim cadence due
        # (the cadence clock starts at speech start; advance it past 1 s
        # BEFORE the maybe_end window so the fallback interim is eligible)
        for loud, windows in [(True, 2), (False, 1)]:
            for chunk in _chunks(loud, windows * 10):
                await s.on_audio(chunk)
            clock[0] += 2.0
            await s.flush_vad()
            await asyncio.sleep(0.02)
        await asyncio.sleep(0.05)
        interims = [c for c in eng.calls if c[1] == cfg.interim_max_new_tokens]
        assert interims, "no interim ran on the gated-off maybe_end window"
        await s.flush()
        await s.cleanup()

    async def test_eager_respects_engine_capacity_gate(self):
        cfg = AppConfig()
        msgs = []

        async def send(m):
            msgs.append(m)

        eng = RecordingEngine()
        eng.eager_ok = lambda: False  # engine reports no slack
        s = StreamSession("c", cfg, eng, send)
        await _feed(s, [(True, 2), (False, 2)])
        await s.flush()
        await s.cleanup()

        committed = [m for m in msgs if m["type"] == "committed_output"]
        assert len(committed) == 1
        # no speculation: one plain final over the full range
        finals = [c for c in eng.calls if c[1] > cfg.interim_max_new_tokens]
        assert len(finals) == 1
        assert finals[0][0] == 40 * CHUNK


# ---------------------------------------------------------------------------
# engine cancellation (real BatchedEngine, tiny model)
# ---------------------------------------------------------------------------


class TestEngineCancellation:
    @pytest.fixture(scope="class")
    def stack(self):
        from sonicscribe_tpu.engine.transcriber import Transcriber
        from sonicscribe_tpu.models import tiny
        from sonicscribe_tpu.models.glm_asr import init_params
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer

        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        tr = Transcriber(
            cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128)
        )
        return cfg, tr

    def test_cancelled_request_frees_slot_and_engine_recovers(self, stack):
        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.vad.model import EnergyVad

        cfg, tr = stack
        t = np.arange(SR // 2) / SR
        audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=128)
            try:
                task = asyncio.ensure_future(
                    eng.transcribe(audio, SR, max_new_tokens=128)
                )
                # wait for admission so the cancel lands on an ACTIVE slot
                for _ in range(1500):
                    if eng.long.n_active > 0:
                        break
                    await asyncio.sleep(0.02)
                assert eng.long.n_active > 0
                task.cancel()
                with pytest.raises(asyncio.CancelledError):
                    await task
                # the sweep frees the slot within a few ticks
                for _ in range(500):
                    if eng.long.free == len(eng.long.slots):
                        break
                    await asyncio.sleep(0.02)
                assert eng.long.free == len(eng.long.slots)
                assert eng.stats.get("cancelled_slots", 0) >= 1
                # and the engine still serves correctly afterwards
                golden = tr.transcribe(audio, SR, max_new_tokens=8)
                got = await eng.transcribe(audio, SR, max_new_tokens=8)
                np.testing.assert_array_equal(got.tokens, golden.tokens)
            finally:
                eng.shutdown()

        asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())

    def test_cancelled_before_admission_dropped_from_backlog(self, stack):
        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.vad.model import EnergyVad

        cfg, tr = stack
        t = np.arange(SR // 2) / SR
        audio = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

        async def go():
            eng = BatchedEngine(tr, EnergyVad(), slots=1, max_decode_tokens=128)
            try:
                # fill the single slot, queue one more, cancel the queued one
                first = asyncio.ensure_future(
                    eng.transcribe(audio, SR, max_new_tokens=64)
                )
                for _ in range(1500):
                    if eng.long.n_active > 0:
                        break
                    await asyncio.sleep(0.02)
                assert eng.long.n_active > 0
                queued = asyncio.ensure_future(
                    eng.transcribe(audio, SR, max_new_tokens=64)
                )
                await asyncio.sleep(0.05)
                queued.cancel()
                with pytest.raises(asyncio.CancelledError):
                    await queued
                r1 = await first
                assert len(r1.tokens) > 0
                # the cancelled backlog entry must not occupy the slot after
                for _ in range(500):
                    if eng.long.free == len(eng.long.slots):
                        break
                    await asyncio.sleep(0.02)
                assert eng.long.free == len(eng.long.slots)
            finally:
                eng.shutdown()

        asyncio.get_event_loop_policy().new_event_loop().run_until_complete(go())


class TestAdaptiveEagerGate:
    """Engine-side launch gate: lost bets close it (except measurement
    probes), confirmations reopen it."""

    def _engine(self):
        from sonicscribe_tpu.engine.transcriber import Transcriber
        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.models import tiny
        from sonicscribe_tpu.models.glm_asr import init_params
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer
        from sonicscribe_tpu.vad.model import EnergyVad

        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
        return BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32)

    @staticmethod
    def _prove_slack(eng):
        """Clear the congestion EMA as a run of healthy interim waves
        would (it boots pessimistic, above budget)."""
        eng.short_queue_ema = 0.0

    def test_closes_on_lost_bets_probes_and_reopens(self):
        eng = self._engine()
        try:
            eng.eager_window_s = 0.0  # fold every outcome (no burst window)
            # fresh engine: gate closed until slack is PROVEN (the queue
            # EMA initializes above budget); one healthy wave opens it
            assert not eng.eager_ok()
            self._prove_slack(eng)
            assert eng.eager_ok()
            for _ in range(10):
                eng.eager_outcome(False)
            assert eng.eager_accept_ema < eng.eager_accept_min
            # closed: only every 8th candidate launches (probe)
            grants = [eng.eager_ok() for _ in range(16)]
            assert sum(grants) == 2, grants
            # confirmed probes reopen the gate
            for _ in range(10):
                eng.eager_outcome(True)
            assert eng.eager_accept_ema >= eng.eager_accept_min
            assert all(eng.eager_ok() for _ in range(4))
        finally:
            eng.shutdown()

    def test_speculative_escalation_confidence_priced(self):
        """Quiet-window k-escalation for an UNCONFIRMED eager final is
        priced by the bet-confirmation EMA: healthy EMA -> escalate (bets
        almost always confirm, the eager win depends on it); collapsed EMA
        -> cap at the live k so a lost bet's escalated program can't block
        the resumed speech's interims (EAGER_FINALS_BENCH worstcase interim
        p95). Promotion at gate confirmation restores escalation regardless
        of the EMA."""
        import time
        from types import SimpleNamespace

        eng = self._engine()
        try:
            idx = eng.alloc_stream()  # live realtime stream -> caps apply
            assert idx is not None
            slot = eng.long.slots[0]
            slot.active = True
            slot.budget = 200
            slot.steps_seen = 0
            slot.request = SimpleNamespace(speculative=True, stream_idx=idx)
            # short class quiet (silence phase)
            eng._last_short_admit = time.perf_counter() - 10.0
            assert eng._short_quiet()
            # healthy EMA: speculation escalates like a confirmed final
            assert eng.eager_accept_ema >= eng.eager_accept_min
            assert eng._pick_k(eng.long) == eng.long_idle_k_cap
            # collapsed EMA (drifting workload): speculation is capped
            eng.eager_accept_ema = 0.0
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap
            # gate confirmation promotes the in-flight request: escalation
            # returns even with the EMA collapsed
            eng.confirm_speculative(idx)
            assert not slot.request.speculative
            assert eng._pick_k(eng.long) == eng.long_idle_k_cap
            # ongoing interim traffic still suppresses escalation entirely
            eng._last_short_admit = time.perf_counter()
            assert eng._pick_k(eng.long) <= eng.long_live_k_cap
        finally:
            slot.active = False
            slot.request = None
            eng.shutdown()

    def test_confirm_speculative_reaches_queued_requests(self):
        """A synchronized final wave can outnumber the slot pool: a request
        still in the intake queue at confirmation must be promoted too, or
        it decodes its whole (post-confirmation) budget de-escalated."""
        import asyncio as aio

        from sonicscribe_tpu.engine.batcher import _RingTranscribeReq

        eng = self._engine()
        try:
            idx = eng.alloc_stream()
            loop = aio.new_event_loop()
            req = _RingTranscribeReq(
                idx, 0, 10, 32, None, 0.64, loop.create_future(), 0.0,
                speculative=True,
            )
            eng._ring_requests.put_nowait(req)
            eng.confirm_speculative(idx)
            assert not req.speculative
            loop.close()
        finally:
            eng.shutdown()

    def test_synchronized_confirmation_wave_counts_once(self):
        """Lockstep workloads deliver 50 outcomes in one gate window; the
        EMA must treat the wave as ONE observation — a collapsed gate that
        reopened on a single synchronized confirmation wave floods the next
        maybe_end with 50 full-budget escalated bets (measured 11-70 s
        interim p95 spikes, EAGER_FINALS_BENCH worstcase)."""
        eng = self._engine()
        try:
            eng.eager_window_s = 0.0
            for _ in range(10):
                eng.eager_outcome(False)
            assert eng.eager_accept_ema < eng.eager_accept_min
            # a synchronized wave of 50 confirmations within one window
            eng.eager_window_s = 0.64
            eng._eager_fold_t -= 1.0  # window elapsed before the wave
            for _ in range(50):
                eng.eager_outcome(True)
            # one fold of mean=1.0: EMA moves by at most 0.1, gate stays shut
            assert eng.eager_accept_ema < eng.eager_accept_min
            assert len(eng._eager_pending) <= 49  # rest buffered, not folded
        finally:
            eng.shutdown()

    def test_congestion_closes_gate(self):
        """Speculation may only spend slack: with the interim class already
        queueing for admission (oversubscribed chip), the launch gate closes
        regardless of the confirmation EMA (SCALE_BENCH 100-stream
        regression: interim p50 322 -> 738 ms with the gate absent)."""
        eng = self._engine()
        try:
            # initialized pessimistic: closed until slack is measured
            assert eng.short_queue_ema > eng.eager_queue_budget_ms
            assert not eng.eager_ok()
            TestAdaptiveEagerGate._prove_slack(eng)
            assert eng.eager_ok()
            eng.short_queue_ema = eng.eager_queue_budget_ms + 1.0
            assert not eng.eager_ok()
            # one heavily congested reap pushes the EMA back above budget
            TestAdaptiveEagerGate._prove_slack(eng)
            eng._note_short_queue(20 * eng.eager_queue_budget_ms)
            assert not eng.eager_ok()
        finally:
            eng.shutdown()

    def test_backlog_and_spec_cap_close_gate(self):
        """Structural capacity checks: a non-empty final-class backlog or
        speculative slots already holding half the long pool deny launches
        regardless of the congestion signals."""
        from types import SimpleNamespace

        eng = self._engine()
        try:
            TestAdaptiveEagerGate._prove_slack(eng)
            assert eng.eager_ok()
            eng._ring_backlog.append(SimpleNamespace(speculative=False))
            assert not eng.eager_ok()
            eng._ring_backlog.clear()
            n_cap = max(1, len(eng.long.slots) // 2)
            for s in eng.long.slots[:n_cap]:
                s.active = True
                s.request = SimpleNamespace(speculative=True)
            assert not eng.eager_ok()
            for s in eng.long.slots:
                s.active = False
                s.request = None
        finally:
            eng.shutdown()

    def test_stream_oversubscription_closes_gate(self):
        """More live streams than long slots: a synchronized final wave
        oversubscribes the pool even without speculation, so eager launches
        are denied outright (the congestion signals alone reopened the gate
        whenever a faster decode kept queue waits under budget, and the bet
        waves still thrashed — SCALE_BENCH 100-stream int8)."""
        eng = self._engine()  # slots=4
        try:
            TestAdaptiveEagerGate._prove_slack(eng)
            assert eng.eager_ok()
            claimed = [eng.alloc_stream() for _ in range(len(eng.long.slots) + 1)]
            assert all(i is not None for i in claimed)
            assert not eng.eager_ok()
            eng.free_stream(claimed.pop())
            assert eng.eager_ok()
            for i in claimed:
                eng.free_stream(i)
        finally:
            eng.shutdown()

    def test_capacity_trumps_accept_rate(self):
        eng = self._engine()
        try:
            # occupy >3/4 of the long pool: gate must refuse regardless of EMA
            for s in eng.long.slots[: len(eng.long.slots) - 0]:
                s.active = True
            assert not eng.eager_ok()
        finally:
            for s in eng.long.slots:
                s.active = False
            eng.shutdown()
