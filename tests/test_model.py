"""Component tests for the GLM-ASR JAX model (tiny random config).

The critical invariant (SURVEY.md §7 hard-part #2): the incremental
prefill+decode_step path must produce exactly the tokens a full-context
forward pass would — this is what makes the persistent KV cache trustworthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.models import tiny
from sonicscribe_tpu.models.glm_asr import (
    decode_step,
    embed_tokens,
    encode_audio,
    greedy_generate,
    init_cache,
    init_params,
    param_count,
    prefill,
)
from sonicscribe_tpu.models.tokenizer import ByteTokenizer, build_prompt, format_hotwords_prompt


@pytest.fixture(scope="module")
def setup():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


class TestEncoder:
    def test_shapes(self, setup):
        cfg, params = setup
        B, T = 2, 128
        mel = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.encoder.n_mels))
        n_frames = jnp.array([128, 64])
        out, n_tok = encode_audio(params, cfg, mel, n_frames)
        assert out.shape == (B, T // cfg.frames_per_audio_token, cfg.decoder.d_model)
        assert list(n_tok) == [16, 8]

    def test_padding_invariance(self, setup):
        """Zero-padding the time axis must not change valid audio tokens."""
        cfg, params = setup
        T = 64
        mel = jax.random.normal(jax.random.PRNGKey(2), (1, T, cfg.encoder.n_mels))
        n = jnp.array([T])
        short, n_tok = encode_audio(params, cfg, mel, n)
        padded = jnp.pad(mel, ((0, 0), (0, 64), (0, 0)))
        long, _ = encode_audio(params, cfg, padded, n)
        k = int(n_tok[0])
        np.testing.assert_allclose(
            np.asarray(short[0, :k]), np.asarray(long[0, :k]), rtol=2e-5, atol=2e-5
        )


class TestDecoder:
    def test_incremental_matches_full_context(self, setup):
        """prefill(prompt) + N x decode_step == prefill(prompt + N tokens)."""
        cfg, params = setup
        B, L, N = 1, 12, 6
        rng = jax.random.PRNGKey(3)
        prompt = jax.random.normal(rng, (B, L, cfg.decoder.d_model)) * 0.1
        length = jnp.array([L])

        # incremental path
        cache = init_cache(cfg, B, L + N + 1, dtype=jnp.float32)
        cache, logits = prefill(params, cfg, prompt, length, cache)
        toks = [int(jnp.argmax(logits, -1)[0])]
        inc_logits = [np.asarray(logits[0])]
        for _ in range(N):
            cache, logits = decode_step(
                params, cfg, cache, jnp.array([toks[-1]], jnp.int32)
            )
            inc_logits.append(np.asarray(logits[0]))
            toks.append(int(jnp.argmax(logits, -1)[0]))

        # full-context path: re-run prefill over prompt + generated tokens
        tok_embeds = embed_tokens(params, jnp.array([toks[:N]], jnp.int32))
        full = jnp.concatenate([prompt, tok_embeds], axis=1)
        cache2 = init_cache(cfg, B, L + N + 1, dtype=jnp.float32)
        _, logits_full = prefill(params, cfg, full, jnp.array([L + N]), cache2)
        np.testing.assert_allclose(
            inc_logits[-1], np.asarray(logits_full[0]), rtol=2e-4, atol=2e-4
        )
        assert int(jnp.argmax(logits_full, -1)[0]) == toks[-1]

    def test_kv_write_placement_parity(self, setup):
        """decode_step's two KV-write forms (in-scan default vs read-only-scan
        + post-scan scatter, see DECODE_STEP_BENCH.json) are numerically
        equivalent: same logits, same cache contents."""
        cfg, params = setup
        B, L, N = 3, 10, 5
        rng = jax.random.PRNGKey(7)
        prompt = jax.random.normal(rng, (B, L, cfg.decoder.d_model)) * 0.1
        lengths = jnp.array([L, L - 3, L - 6])

        caches, all_logits = [], []
        for in_scan in (True, False):
            cache = init_cache(cfg, B, L + N + 1, dtype=jnp.float32)
            cache, logits = prefill(params, cfg, prompt, lengths, cache)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            seq = []
            for _ in range(N):
                cache, logits = decode_step(
                    params, cfg, cache, tok, kv_write_in_scan=in_scan
                )
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                seq.append(np.asarray(logits))
            caches.append(cache)
            all_logits.append(seq)
        for a, b in zip(*all_logits):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(caches[0]["k"]), np.asarray(caches[1]["k"]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(caches[0]["len"]), np.asarray(caches[1]["len"])
        )

    def test_kv_write_parity_full_cache(self, setup):
        """Cache completely full (pos == max_len): the in-scan form drops the
        write and never attends the current token; the read-only form must
        match (its extra score column is masked), not silently diverge."""
        cfg, params = setup
        L = 12
        prompt = jax.random.normal(
            jax.random.PRNGKey(21), (2, L, cfg.decoder.d_model)
        ) * 0.1
        lengths = jnp.array([L, L])
        logits = []
        for in_scan in (True, False):
            cache = init_cache(cfg, 2, L, dtype=jnp.float32)  # max_len == L
            cache, lg = prefill(params, cfg, prompt, lengths, cache)
            tok = jnp.argmax(lg, -1).astype(jnp.int32)
            cache, lg = decode_step(
                params, cfg, cache, tok, kv_write_in_scan=in_scan
            )
            logits.append(np.asarray(lg))
        np.testing.assert_allclose(logits[0], logits[1], rtol=1e-5, atol=1e-5)

    def test_decode_step_dual_matches_single(self, setup):
        """decode_step_dual (one program for two cache pools, weights read
        once) is row-identical to two decode_step calls."""
        from sonicscribe_tpu.models.glm_asr import decode_step_dual

        cfg, params = setup
        rng = jax.random.PRNGKey(11)
        pa = jax.random.normal(rng, (2, 8, cfg.decoder.d_model)) * 0.1
        pb = jax.random.normal(jax.random.PRNGKey(12), (3, 14, cfg.decoder.d_model)) * 0.1
        la, lb = jnp.array([8, 5]), jnp.array([14, 9, 3])

        ca = init_cache(cfg, 2, 16, dtype=jnp.float32)
        cb = init_cache(cfg, 3, 24, dtype=jnp.float32)
        ca, log_a = prefill(params, cfg, pa, la, ca)
        cb, log_b = prefill(params, cfg, pb, lb, cb)
        ta = jnp.argmax(log_a, -1).astype(jnp.int32)
        tb = jnp.argmax(log_b, -1).astype(jnp.int32)

        # single path (reference)
        ca1, cb1, ta1, tb1 = ca, cb, ta, tb
        ref_a, ref_b = [], []
        for _ in range(4):
            ca1, l1 = decode_step(params, cfg, ca1, ta1)
            cb1, l2 = decode_step(params, cfg, cb1, tb1)
            ta1 = jnp.argmax(l1, -1).astype(jnp.int32)
            tb1 = jnp.argmax(l2, -1).astype(jnp.int32)
            ref_a.append(np.asarray(l1))
            ref_b.append(np.asarray(l2))

        # dual path
        ca2, cb2, ta2, tb2 = ca, cb, ta, tb
        for i in range(4):
            ca2, l1, cb2, l2 = decode_step_dual(params, cfg, ca2, ta2, cb2, tb2)
            ta2 = jnp.argmax(l1, -1).astype(jnp.int32)
            tb2 = jnp.argmax(l2, -1).astype(jnp.int32)
            np.testing.assert_allclose(np.asarray(l1), ref_a[i], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(l2), ref_b[i], rtol=1e-5, atol=1e-5)
        for single, dual in ((ca1, ca2), (cb1, cb2)):
            for key in ("k", "v"):
                np.testing.assert_allclose(
                    np.asarray(single[key]), np.asarray(dual[key]),
                    rtol=1e-6, atol=1e-6,
                )
            np.testing.assert_array_equal(
                np.asarray(single["len"]), np.asarray(dual["len"])
            )

    def test_prefill_padding_invariance(self, setup):
        """Extra padded positions beyond `length` must not affect logits."""
        cfg, params = setup
        D = cfg.decoder.d_model
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, D)) * 0.1
        cache = init_cache(cfg, 1, 32, dtype=jnp.float32)
        _, l1 = prefill(params, cfg, x, jnp.array([8]), cache)
        xp = jnp.pad(x, ((0, 0), (0, 8), (0, 0)), constant_values=3.0)
        cache2 = init_cache(cfg, 1, 32, dtype=jnp.float32)
        _, l2 = prefill(params, cfg, xp, jnp.array([8]), cache2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)

    def test_greedy_generate_matches_stepwise(self, setup):
        cfg, params = setup
        B, L, N = 2, 10, 8
        prompt = jax.random.normal(jax.random.PRNGKey(5), (B, L, cfg.decoder.d_model)) * 0.1
        length = jnp.array([L, 7])
        out = np.asarray(greedy_generate(params, cfg, prompt, length, N))
        assert out.shape == (B, N)

        # stepwise replication for row 0
        cache = init_cache(cfg, B, L + N, dtype=jnp.float32)
        cache, logits = prefill(params, cfg, prompt, length, cache)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got = [np.asarray(tok)]
        done = tok == cfg.eos_id
        for _ in range(N - 1):
            cache, logits = decode_step(params, cfg, cache, tok, active=~done)
            tok = jnp.where(done, cfg.pad_id, jnp.argmax(logits, -1).astype(jnp.int32))
            got.append(np.asarray(tok))
            done = done | (tok == cfg.eos_id)
        np.testing.assert_array_equal(out, np.stack(got, 1))

    def test_logit_bias_changes_output(self, setup):
        cfg, params = setup
        prompt = jax.random.normal(jax.random.PRNGKey(6), (1, 6, cfg.decoder.d_model)) * 0.1
        length = jnp.array([6])
        base = np.asarray(greedy_generate(params, cfg, prompt, length, 4))
        bias = jnp.zeros((cfg.decoder.vocab_size,)).at[123].set(1e9)
        biased = np.asarray(
            greedy_generate(params, cfg, prompt, length, 4, logit_bias=bias)
        )
        assert np.all(biased == 123)
        assert not np.all(base == 123)


class TestTokenizer:
    def test_byte_roundtrip(self):
        tok = ByteTokenizer()
        s = "你好 hello, würld! 123"
        assert tok.decode(tok.encode(s)) == s

    def test_hotword_prompt_parity(self):
        """Reference semantics: dedupe, lowercase, cap 10 (asr.py:303-333)."""
        out = format_hotwords_prompt(["TPU", " tpu ", "JAX", ""] + [f"w{i}" for i in range(12)])
        assert out.startswith(". Pay special attention to these important terms: ")
        assert '"tpu"' in out and out.count('"') == 20  # 10 words max
        assert format_hotwords_prompt([]) == ""
        assert format_hotwords_prompt(None) == ""

    def test_build_prompt(self):
        cfg = tiny()
        tok = ByteTokenizer(cfg)
        p = build_prompt(tok, cfg, hotwords=["jax"])
        assert p.prefix_ids[0] == cfg.bos_id
        assert p.suffix_ids[0] == cfg.audio_end_id
        assert p.suffix_ids[-1] == cfg.assistant_id

    def test_prompt_cache_lru_survives_hotword_churn(self):
        """Adversarial unique-hotword churn must not evict the steady-state
        prompt (rebuilt per backlogged request per scheduler tick): the cache
        evicts LRU one-at-a-time, and hits refresh recency."""
        from sonicscribe_tpu.models import tokenizer as tk

        cfg = tiny()
        tok = ByteTokenizer(cfg)
        steady = build_prompt(tok, cfg, hotwords=["jax"])
        for i in range(5000):
            build_prompt(tok, cfg, hotwords=[f"churn{i}"])
            if i % 256 == 0:  # steady-state key is re-hit between churn bursts
                assert build_prompt(tok, cfg, hotwords=["jax"]) is steady
        assert len(tk._PROMPT_CACHE) <= 4096
        assert build_prompt(tok, cfg, hotwords=["jax"]) is steady


def test_param_count_tiny(setup):
    cfg, params = setup
    n = param_count(params)
    assert 100_000 < n < 5_000_000
