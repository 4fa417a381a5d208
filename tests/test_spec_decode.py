"""Speculative verification: verify_step must reproduce decode_step's
greedy tokens exactly (lossless speculation), and the engine's verify-
rounds program must emit token-identical output for golden, garbage, and
partial drafts (models/glm_asr.py verify_step; engine/batcher.py)."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import (
    decode_step,
    init_params,
    verify_step,
)

SR = 16000


@pytest.fixture(scope="module")
def model():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _fresh_cache(cfg, B, max_len, rng):
    dec = cfg.decoder
    # random "history" of varying length per row, like a post-prefill cache
    ck = jnp.asarray(
        rng.standard_normal(
            (dec.n_layers, B, max_len, dec.n_kv_heads, dec.head_dim)
        ).astype(np.float32) * 0.3
    )
    cv = jnp.asarray(
        rng.standard_normal(
            (dec.n_layers, B, max_len, dec.n_kv_heads, dec.head_dim)
        ).astype(np.float32) * 0.3
    )
    cl = jnp.asarray(rng.integers(3, max_len // 2, (B,)), jnp.int32)
    return {"k": ck, "v": cv, "len": cl}


class TestVerifyStepParity:
    def test_matches_sequential_greedy(self, model):
        """verify_step's logits[:, j] must argmax to exactly the token the
        sequential decode_step chain produces at that point, with the same
        cache contents over the valid prefix."""
        cfg, params = model
        B, MAX_LEN, W = 3, 64, 4
        rng = np.random.default_rng(7)
        cache0 = _fresh_cache(cfg, B, MAX_LEN, rng)
        tok0 = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size - 1, (B,)),
                           jnp.int32)

        # sequential golden chain: W+1 decode steps
        cache_seq = dict(cache0)
        tok = tok0
        golden = []
        for _ in range(W + 1):
            cache_seq, logits = decode_step(params, cfg, cache_seq, tok)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            golden.append(np.asarray(tok))
        golden = np.stack(golden, axis=1)  # [B, W+1]

        # verify with the GOLDEN draft: inputs = [tok0, g_0..g_{W-1}]
        inputs = jnp.concatenate(
            [tok0[:, None], jnp.asarray(golden[:, :W])], axis=1
        )
        cache_v, logits_v = verify_step(params, cfg, dict(cache0), inputs)
        got = np.asarray(jnp.argmax(logits_v, -1))  # [B, W+1]
        np.testing.assert_array_equal(got, golden)

        # cache parity over the written prefix: positions len..len+W must
        # hold the same K/V the sequential chain stored
        cl = np.asarray(cache0["len"])
        ck_seq, ck_ver = np.asarray(cache_seq["k"]), np.asarray(cache_v["k"])
        cv_seq, cv_ver = np.asarray(cache_seq["v"]), np.asarray(cache_v["v"])
        for b in range(B):
            sl = slice(cl[b], cl[b] + W + 1)
            np.testing.assert_allclose(
                ck_ver[:, b, sl], ck_seq[:, b, sl], rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                cv_ver[:, b, sl], cv_seq[:, b, sl], rtol=1e-5, atol=1e-5
            )

    def test_first_logit_immune_to_draft(self, model):
        """logits[:, 0] depends only on x_0 + history — a garbage draft must
        not change the first greedy pick (causal masking is airtight)."""
        cfg, params = model
        B, MAX_LEN, W = 2, 48, 3
        rng = np.random.default_rng(11)
        cache0 = _fresh_cache(cfg, B, MAX_LEN, rng)
        tok0 = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size - 1, (B,)),
                           jnp.int32)
        good = jnp.asarray(
            rng.integers(5, cfg.decoder.vocab_size - 1, (B, W)), jnp.int32
        )
        bad = (good + 7) % cfg.decoder.vocab_size

        _, la = verify_step(
            params, cfg, dict(cache0),
            jnp.concatenate([tok0[:, None], good], 1),
        )
        _, lb = verify_step(
            params, cfg, dict(cache0),
            jnp.concatenate([tok0[:, None], bad], 1),
        )
        np.testing.assert_allclose(
            np.asarray(la[:, 0]), np.asarray(lb[:, 0]), rtol=1e-5, atol=1e-5
        )


def _audio(seconds=0.5, f=300.0, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    x = 0.3 * np.sin(2 * np.pi * f * t)
    return (x + 0.01 * np.random.default_rng(seed).standard_normal(len(t))).astype(
        np.float32
    )


class TestEngineSpeculativeFinals:
    """BatchedEngine verify path: drafted requests must be token-identical
    to undrafted ones for every draft quality, and golden drafts must
    actually ride the verify programs."""

    @pytest.fixture(scope="class")
    def engine_stack(self):
        from sonicscribe_tpu.engine.transcriber import Transcriber
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer

        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
        return cfg, tr

    def _engine(self, tr):
        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.vad.model import EnergyVad

        return BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=24)

    def test_draft_quality_never_changes_tokens(self, engine_stack):
        cfg, tr = engine_stack
        audio = _audio(0.5, seed=3)
        golden = tr.transcribe(audio, SR, max_new_tokens=20).tokens

        async def run_all():
            eng = self._engine(tr)
            try:
                base = await eng.transcribe(audio, SR, max_new_tokens=20)
                drafts = {
                    "golden": np.asarray(base.tokens, np.int32),
                    "garbage": (np.asarray(base.tokens, np.int32) + 11)
                    % cfg.decoder.vocab_size,
                    "partial": np.concatenate(
                        [
                            np.asarray(base.tokens[:5], np.int32),
                            (np.asarray(base.tokens[5:], np.int32) + 7)
                            % cfg.decoder.vocab_size,
                        ]
                    ),
                    "short": np.asarray(base.tokens[:3], np.int32),
                }
                results = {}
                for name, d in drafts.items():
                    r = await eng.transcribe(
                        audio, SR, max_new_tokens=20, draft_tokens=d
                    )
                    results[name] = r.tokens
                return base.tokens, results, dict(eng.stats)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        base_tokens, results, stats = loop.run_until_complete(run_all())
        loop.close()
        np.testing.assert_array_equal(base_tokens, golden)
        for name, toks in results.items():
            np.testing.assert_array_equal(toks, golden, err_msg=name)
        assert stats.get("verify_rounds", 0) > 0, "verify path never ran"

    def test_exhausted_draft_returns_to_plain_ladder(self, engine_stack):
        """A short draft must not pin the request to the verify path for its
        whole decode: once the draft is spent, the _SPEC_LIVE_FLAG status
        bit clears `drafted` and the remaining tokens ride the plain
        k-escalated programs (1 token/round on verify would otherwise cap
        long finals at ~8 tokens per dispatch)."""
        cfg, tr = engine_stack
        audio = _audio(0.5, seed=3)
        golden = tr.transcribe(audio, SR, max_new_tokens=20).tokens

        async def go():
            eng = self._engine(tr)
            try:
                r = await eng.transcribe(
                    audio, SR, max_new_tokens=20,
                    draft_tokens=np.asarray(golden[:3], np.int32),
                )
                return r.tokens, dict(eng.stats)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        toks, stats = loop.run_until_complete(go())
        loop.close()
        np.testing.assert_array_equal(toks, golden)
        # the 2-token draft (token 0 is stripped) is spent in round one;
        # the parked-status lag allows a couple more verify dispatches
        # before the flag lands, but nowhere near the ~17 rounds that
        # decoding the whole budget on the verify path would take
        assert 0 < stats.get("verify_rounds", 0) <= 8, stats.get("verify_rounds")

    def test_adaptive_gate_closes_and_recovers(self, engine_stack):
        """Sustained garbage drafts must drive the acceptance EMA below the
        floor (drafts received but no verify rounds spent), and golden
        drafts must reopen it — the EMA is measured against the plain
        greedy output, so it recovers while the gate is closed."""
        cfg, tr = engine_stack
        audio = _audio(0.5, seed=3)
        golden = np.asarray(
            tr.transcribe(audio, SR, max_new_tokens=20).tokens, np.int32
        )
        garbage = (golden + 11) % cfg.decoder.vocab_size

        async def go():
            eng = self._engine(tr)
            try:
                for _ in range(10):
                    await eng.transcribe(audio, SR, max_new_tokens=20,
                                         draft_tokens=garbage)
                assert eng.spec_accept_ema < eng.spec_accept_min
                closed_at = eng.stats.get("verify_rounds", 0)
                r = await eng.transcribe(audio, SR, max_new_tokens=20,
                                         draft_tokens=garbage)
                np.testing.assert_array_equal(r.tokens, golden)
                assert eng.stats.get("verify_rounds", 0) == closed_at, (
                    "gate closed but verify rounds were still spent"
                )
                # golden drafts are measured even while closed -> reopens
                for _ in range(6):
                    r = await eng.transcribe(audio, SR, max_new_tokens=20,
                                             draft_tokens=golden)
                assert eng.spec_accept_ema >= eng.spec_accept_min
                reopened_at = eng.stats.get("verify_rounds", 0)
                await eng.transcribe(audio, SR, max_new_tokens=20,
                                     draft_tokens=golden)
                assert eng.stats.get("verify_rounds", 0) > reopened_at
                np.testing.assert_array_equal(r.tokens, golden)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        loop.run_until_complete(go())
        loop.close()

    def test_concurrent_mixed_drafted_and_plain(self, engine_stack):
        """Drafted and undrafted requests sharing the pool (and the same
        verify programs) stay token-exact."""
        cfg, tr = engine_stack
        audios = [_audio(0.4 + 0.05 * i, f=220 + 40 * i, seed=i) for i in range(6)]
        golden = [tr.transcribe(a, SR, max_new_tokens=20).tokens for a in audios]

        async def go():
            eng = self._engine(tr)
            try:
                rs = await asyncio.gather(
                    *[
                        eng.transcribe(
                            a, SR, max_new_tokens=20,
                            draft_tokens=(golden[i] if i % 2 == 0 else None),
                        )
                        for i, a in enumerate(audios)
                    ]
                )
                return [r.tokens for r in rs], dict(eng.stats)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        got, stats = loop.run_until_complete(go())
        loop.close()
        for i, (g, w) in enumerate(zip(got, golden)):
            np.testing.assert_array_equal(g, w, err_msg=f"request {i}")
        assert stats.get("verify_rounds", 0) > 0


class TestEngineSpeculativeInterims:
    """Short-pool verify path (speculative interims, default OFF): interim-
    sized budgets route to the SHORT pool, whose drafted requests must ride
    the verify programs with the same lossless guarantee as finals. With
    the reference constants the session never produces such drafts (the
    sliding interim window never repeats a start — see
    config.speculative_interims), so production warmup skips the short
    verify grid; these tests pin the lossless contract for configurations
    that can fire it (un-warmed engines JIT the verify program on demand)."""

    @pytest.fixture(scope="class")
    def engine_stack(self):
        from sonicscribe_tpu.engine.transcriber import Transcriber
        from sonicscribe_tpu.models.tokenizer import ByteTokenizer

        cfg = tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
        return cfg, tr

    def _engine(self, tr):
        from sonicscribe_tpu.engine.batcher import BatchedEngine
        from sonicscribe_tpu.vad.model import EnergyVad

        return BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=24)

    def test_short_pool_draft_parity_and_verify_rounds(self, engine_stack):
        cfg, tr = engine_stack
        audio = _audio(0.4, seed=5)  # fits the smallest mel bucket
        budget = 12  # < short_budget (16): routes to the short pool
        golden = tr.transcribe(audio, SR, max_new_tokens=budget).tokens

        async def run_all():
            eng = self._engine(tr)
            try:
                base = await eng.transcribe(audio, SR, max_new_tokens=budget)
                drafts = {
                    "golden": np.asarray(base.tokens, np.int32),
                    "garbage": (np.asarray(base.tokens, np.int32) + 11)
                    % cfg.decoder.vocab_size,
                    "partial": np.concatenate(
                        [
                            np.asarray(base.tokens[:4], np.int32),
                            (np.asarray(base.tokens[4:], np.int32) + 7)
                            % cfg.decoder.vocab_size,
                        ]
                    ),
                }
                results = {}
                for name, d in drafts.items():
                    r0 = eng.stats.get("verify_rounds", 0)
                    r = await eng.transcribe(
                        audio, SR, max_new_tokens=budget, draft_tokens=d
                    )
                    results[name] = (r.tokens, eng.stats.get("verify_rounds", 0) - r0)
                return base.tokens, results, dict(eng.stats)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        base_tokens, results, stats = loop.run_until_complete(run_all())
        loop.close()
        np.testing.assert_array_equal(base_tokens, golden)
        for name, (toks, _) in results.items():
            np.testing.assert_array_equal(toks, golden, err_msg=name)
        # the requests actually ran on the short pool...
        assert stats.get("short_lat_ms", {}).get("queue"), (
            "short pool never served these budgets"
        )
        # ...and the golden draft rode the verify path there: an 11-token
        # stripped draft at w=8 covers the budget in ceil(11/8)=2 rounds
        # (+ parked-status lag), nowhere near the 11 plain steps
        assert 0 < results["golden"][1] <= 4, results["golden"][1]

    def test_short_pool_wave_drafted_parity(self, engine_stack):
        """A synchronized drafted interim wave (the production shape: every
        stream's interim carries its previous tokens) stays token-exact
        across mixed draft quality."""
        cfg, tr = engine_stack
        audios = [_audio(0.3 + 0.04 * i, f=200 + 35 * i, seed=10 + i)
                  for i in range(6)]
        budget = 12
        golden = [tr.transcribe(a, SR, max_new_tokens=budget).tokens
                  for a in audios]

        async def go():
            eng = self._engine(tr)
            try:
                rs = await asyncio.gather(
                    *[
                        eng.transcribe(
                            a, SR, max_new_tokens=budget,
                            draft_tokens=(
                                golden[i] if i % 3 != 2 else
                                (np.asarray(golden[i], np.int32) + 5)
                                % cfg.decoder.vocab_size
                            ),
                        )
                        for i, a in enumerate(audios)
                    ]
                )
                return [r.tokens for r in rs], dict(eng.stats)
            finally:
                eng.shutdown()

        loop = asyncio.new_event_loop()
        got, stats = loop.run_until_complete(go())
        loop.close()
        for i, (g, w) in enumerate(zip(got, golden)):
            np.testing.assert_array_equal(g, w, err_msg=f"request {i}")
        assert stats.get("verify_rounds", 0) > 0
