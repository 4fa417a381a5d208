"""Speculative-finals A/B: committed-output latency with and without the
draft-verify path, on the same warmed engine (VERDICT r2 item 2 follow-on).

The session banks its interim TOKENS and hands them to the final decode as
a speculative draft; the engine verifies them w-at-a-time per weights-read
(models/glm_asr.py verify_step, engine/batcher.py _verify_rounds_program) —
lossless by construction (token-parity tested in tests/test_spec_decode.py
for golden/garbage/partial drafts). This bench prices the shipped flag
(`AppConfig.speculative_finals`) at 50 realtime streams on the chip, under
BOTH workloads:

- worst case: drifting-phase speech/silence cycles -> ~16 s segments,
  ~130-token finals with EOS suppressed (every final runs its full budget);
- utterance: 2.0 s speech / 2.56 s silence -> every utterance ends,
  ~70-token finals (product-typical).

Honesty note recorded in the artifact: the random-weight bench model emits
degenerate repeated tokens, so interim->final draft acceptance is near 1.
Real-checkpoint acceptance is bounded by interim/final transcript
agreement — high for ASR (the interims transcribed the same audio), and
every rejected token costs nothing (the verify round still emits one
correct token, the same as a decode step). The reference has no
counterpart (finals decode token-by-token, backend/asr.py:407-422).

Run on the real chip:  python -m sonicscribe_tpu.tools.bench_spec
Writes SPEC_FINALS_BENCH.json at the repo root.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np


def _pct(xs, p):
    return round(float(np.percentile(xs, p)), 1) if len(xs) else None


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache",
            ),
        ),
    )

    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.engine.batcher import BatchedEngine
    from sonicscribe_tpu.engine.transcriber import Transcriber
    from sonicscribe_tpu.models import nano, tiny
    from sonicscribe_tpu.models.glm_asr import init_params
    from sonicscribe_tpu.models.tokenizer import ByteTokenizer
    from sonicscribe_tpu.tools.loadtest import run_load
    from sonicscribe_tpu.vad.model import SileroCostProbeVad

    quick = "--quick" in sys.argv
    cfg = tiny() if quick else nano()
    dtype = jnp.float32 if quick else jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    tokenizer = ByteTokenizer(cfg)
    no_eos = np.zeros((cfg.decoder.vocab_size,), np.float32)
    no_eos[cfg.eos_id] = -1e9
    no_eos[cfg.pad_id] = -1e9  # worst case: every decode runs its budget

    tr = Transcriber(cfg, params, tokenizer, prefill_buckets=(128, 512))
    engine = BatchedEngine(
        tr, SileroCostProbeVad(), slots=4 if quick else 32,
        max_decode_tokens=200, base_logit_bias=no_eos,
    )
    t0 = time.perf_counter()
    engine.warmup()
    warmup_s = round(time.perf_counter() - t0, 1)

    n_streams = 4 if quick else 50
    seconds = 6.0 if quick else 16.0

    def take_decomposition() -> dict:
        out = {}
        for cls in ("short", "long"):
            lat = engine.stats.pop(cls + "_lat_ms", None)
            if lat and lat["queue"]:
                out[cls] = {
                    "n": len(lat["queue"]),
                    "queue_p50_ms": _pct(lat["queue"], 50),
                    "queue_p95_ms": _pct(lat["queue"], 95),
                    "run_p50_ms": _pct(lat["run"], 50),
                    "run_p95_ms": _pct(lat["run"], 95),
                    "tokens_p50": _pct(lat["tokens"], 50),
                }
        return out

    loop = asyncio.new_event_loop()
    results = []
    workloads = [("worst_case", 1.5), ("utterance", 2.56)]
    for spec in (False, True):
        app_cfg = AppConfig()
        app_cfg.speculative_finals = spec
        if spec:
            engine.spec_accept_ema = 1.0  # fresh gate per ON variant
        for wl_name, silence_s in workloads:
            v0 = engine.stats.get("verify_rounds", 0)
            # settle pass absorbs scheduling warm-in and compile stragglers
            loop.run_until_complete(
                run_load(engine, app_cfg, n_streams, max(4.0, seconds / 2),
                         realtime=True, silence_s=silence_s)
            )
            engine.stats.pop("short_lat_ms", None)
            engine.stats.pop("long_lat_ms", None)
            m = loop.run_until_complete(
                run_load(engine, app_cfg, n_streams, seconds, realtime=True,
                         silence_s=silence_s)
            )
            entry = {
                "variant": f"{wl_name}_{'spec' if spec else 'plain'}",
                "speculative_finals": spec,
                "silence_s": silence_s,
                "interim_p50_ms": m["interim_p50_ms"],
                "interim_p95_ms": m["interim_p95_ms"],
                "committed_count": m["committed_count"],
                "committed_p50_ms": m["committed_p50_ms"],
                "committed_p95_ms": m["committed_p95_ms"],
                "verify_rounds": engine.stats.get("verify_rounds", 0) - v0,
                "decomposition": take_decomposition(),
            }
            results.append(entry)
            print(json.dumps(entry))
    # ---- ceiling: golden drafts through the engine API ----
    # The session-workload A/B above prices the SHIPPED path, where draft
    # quality is whatever the random-weight model's interim/final agreement
    # happens to be (near zero here; with a real ASR checkpoint the interims
    # transcribed the same audio, so agreement is high). This section
    # measures the mechanism's on-chip ceiling directly: the same batch of
    # long-pool finals decoded plain, then re-decoded with their OWN greedy
    # tokens as drafts (acceptance limited only by bf16 near-tie argmax
    # flips between the decode_step and verify_step program shapes).
    n_seg = 4 if quick else 16
    budget = 24 if quick else 130
    seg_audio = []
    rng = np.random.default_rng(0)
    for i in range(n_seg):
        sec = 2.0 if quick else 13.0
        t = np.arange(int(16000 * sec)) / 16000.0
        x = 0.25 * np.sin(2 * np.pi * (220 + 15 * i) * t) + 0.002 * rng.standard_normal(len(t))
        seg_audio.append(x.astype(np.float32))

    async def run_batch(drafts):
        t0 = time.perf_counter()
        rs = await asyncio.gather(*[
            engine.transcribe(
                a, 16000, max_new_tokens=budget,
                draft_tokens=(drafts[i] if drafts else None),
            )
            for i, a in enumerate(seg_audio)
        ])
        return [r.tokens for r in rs], time.perf_counter() - t0

    engine.spec_accept_ema = 1.0
    golden_toks, t_plain = loop.run_until_complete(run_batch(None))
    golden_toks, t_plain = loop.run_until_complete(run_batch(None))  # warmed
    vr0 = engine.stats.get("verify_rounds", 0)
    spec_toks, t_spec = loop.run_until_complete(run_batch(golden_toks))
    mismatches = sum(
        0 if len(a) == len(b) and all(int(x) == int(y) for x, y in zip(a, b)) else 1
        for a, b in zip(golden_toks, spec_toks)
    )
    ceiling = {
        "variant": "ceiling_golden_drafts",
        "n_finals": n_seg,
        "tokens_per_final": budget,
        "plain_s": round(t_plain, 2),
        "spec_s": round(t_spec, 2),
        "speedup": round(t_plain / max(t_spec, 1e-9), 2),
        "verify_rounds": engine.stats.get("verify_rounds", 0) - vr0,
        "accept_ema_after": round(engine.spec_accept_ema, 3),
        "token_mismatches": mismatches,
    }
    results.append(ceiling)
    print(json.dumps(ceiling))

    # ---- mid-acceptance sweep (VERDICT r4 #4): the regime between the
    # endpoints. Drafts are the TRUE greedy tokens with the tail corrupted
    # from a controlled fraction, so matching-prefix acceptance ~= the
    # target. Each fraction starts from a healthy gate (ema=1.0) and runs
    # three batches, recording committed wall time per batch and the
    # acceptance-EMA trajectory — at 25 % the EMA must cross the launch
    # floor (spec_accept_min) and gate drafts OFF (hysteresis shown on a
    # sweep, not asserted); the EMA keeps updating from unspent drafts'
    # prefix match, so a recovered workload re-opens the gate. ----
    V = cfg.decoder.vocab_size

    def corrupt(toks, frac):
        toks = np.asarray(toks, np.int32).copy()
        keep = max(1, int(round(len(toks) * frac)))
        for i in range(keep, len(toks)):
            bad = int(toks[i])
            while True:
                bad = (bad + 1) % V
                if bad not in (cfg.eos_id, cfg.pad_id) and bad != int(toks[i]):
                    break
            toks[i] = bad
        return toks

    for frac in (0.25, 0.5, 0.75):
        engine.spec_accept_ema = 1.0
        drafts = [corrupt(t, frac) for t in golden_toks]
        traj, times = [], []
        vr0 = engine.stats.get("verify_rounds", 0)
        mismatch = 0
        for _rep in range(3):
            toks, t_run = loop.run_until_complete(run_batch(drafts))
            times.append(round(t_run, 2))
            traj.append(round(engine.spec_accept_ema, 3))
            mismatch += sum(
                0 if len(a) == len(b)
                and all(int(x) == int(y) for x, y in zip(a, b)) else 1
                for a, b in zip(golden_toks, toks)
            )
        entry = {
            "variant": f"agreement_{int(frac * 100)}",
            "target_acceptance": frac,
            "n_finals": n_seg,
            "tokens_per_final": budget,
            "plain_s": round(t_plain, 2),
            "runs_s": times,
            "best_speedup_vs_plain": round(t_plain / max(min(times), 1e-9), 2),
            "accept_ema_trajectory": traj,
            "gate_floor": engine.spec_accept_min,
            "gated_off_at_end": engine.spec_accept_ema < engine.spec_accept_min,
            "verify_rounds": engine.stats.get("verify_rounds", 0) - vr0,
            # losslessness check. Exactly 0 in f32 (asserted in --quick;
            # token-parity also tested in test_spec_decode.py). In bf16 on
            # chip, nonzero counts are sequences where a near-tie argmax
            # flipped between the verify_step and decode_step program
            # shapes — the random-weight model's logit margins are tiny, so
            # any accepted prefix can land on the other side of a tie vs
            # the plain-decode reference. More verify rounds spent => more
            # flip opportunities (the chip recording reads 5/21/24 at
            # 25/50/75 % acceptance), the standard numerics caveat of every
            # greedy spec-decode system, not an acceptance-logic defect.
            "token_mismatches": mismatch,
        }
        if quick:
            assert mismatch == 0, f"f32 spec decode must be exact: {entry}"
        results.append(entry)
        print(json.dumps(entry))

    engine.shutdown()
    loop.close()

    out = {
        "bench": "spec_finals",
        "model": "tiny" if quick else "nano",
        "streams": n_streams,
        "seconds_per_run": seconds,
        "warmup_s": warmup_s,
        "backend": jax.default_backend(),
        "note": "A/B of AppConfig.speculative_finals on one warmed engine. "
                "worst_case: drifting-phase cycles, ~130-token finals, EOS "
                "suppressed; utterance: every 2 s utterance ends (~70-token "
                "finals). Random-weight model emits degenerate repeated "
                "tokens so draft acceptance is near 1; real-checkpoint "
                "acceptance = interim/final transcript agreement (high for "
                "ASR), and rejected tokens cost nothing vs a plain decode "
                "step (lossless either way). The agreement_25/50/75 "
                "variants (r5) measure the MIDDLE with tail-corrupted "
                "golden drafts: controlled acceptance, EMA trajectory, and "
                "the launch gate closing at 25 %.",
        "variants": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "SPEC_FINALS_BENCH_quick.json" if quick else "SPEC_FINALS_BENCH.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
