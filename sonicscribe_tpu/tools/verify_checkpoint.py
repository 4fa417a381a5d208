"""Day-one checkpoint runbook: convert -> load -> transcribe -> parity report.

The build environment has zero egress, so the real GLM-ASR-Nano-2512
checkpoint (reference loads it at backend/asr.py:66-82) has never flowed
through this stack. This tool is the first thing to run on a machine that
HAS the weights:

    python -m sonicscribe_tpu.tools.verify_checkpoint <hf_or_native_dir> \
        [--out <native_dir>] [--wav golden.wav --expect "transcript"] [--int8]

Steps and what each proves:
  1. derive   — architecture derived from the checkpoint's config.json
                (convert_weights.cfg_from_hf_config); fails loudly listing
                the missing fields if the real layout differs.
  2. convert  — HF -> native npz through HF_NAME_MAP with per-tensor shape
                validation and an unconsumed-tensor report (name-mapping
                drift cannot pass silently).
  3. load     — native loader + tokenizer carry-over round trip.
  4. twin     — greedy tokens from the JAX stack vs the independent torch
                implementation consuming the SAME converted tree
                (token-exact gate, tools/torch_reference.py). This is the
                strongest hermetic check: it exercises every converted
                tensor through two codebases.
  5. mel      — log-mel front end vs transformers' WhisperFeatureExtractor
                (<=1e-3 north-star tolerance), skipped if transformers
                can't construct one.
  6. wav      — transcribe the given WAV(s); compare to --expect text when
                provided (the real-weights acceptance test).

Exit code 0 = every executed step passed; the report marks skipped steps.
Runs against the synthetic fixture too (tests/test_verify_checkpoint.py),
so the runbook itself is exercised before day one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np


def _ok(name: str, detail: str = "") -> dict:
    return {"step": name, "status": "ok", "detail": detail}


def _fail(name: str, detail: str) -> dict:
    return {"step": name, "status": "FAIL", "detail": detail}


def _skip(name: str, detail: str) -> dict:
    return {"step": name, "status": "skipped", "detail": detail}


def verify(
    src: str,
    out: str | None = None,
    wavs: list[str] | None = None,
    expects: list[str] | None = None,
    int8: bool = False,
    max_new_tokens: int = 48,
) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from sonicscribe_tpu.tools.convert_weights import (
        NATIVE_CONFIG,
        cfg_from_hf_config,
        convert_hf_checkpoint,
        load_checkpoint,
    )

    report: list[dict] = []
    is_native = os.path.exists(os.path.join(src, NATIVE_CONFIG))

    # ---- 1+2: derive + convert (HF input only) ----
    if is_native:
        native_dir = src
        report.append(_skip("derive", "input is already a native checkpoint"))
        report.append(_skip("convert", "input is already a native checkpoint"))
    else:
        try:
            cfg = cfg_from_hf_config(src)
            enc, dec = cfg.encoder, cfg.decoder
            report.append(_ok(
                "derive",
                f"encoder {enc.n_layers}L d={enc.d_model} mels={enc.n_mels}; "
                f"decoder {dec.n_layers}L d={dec.d_model} "
                f"heads={dec.n_heads}/{dec.n_kv_heads} hd={dec.head_dim} "
                f"ffn={dec.ffn_hidden} vocab={dec.vocab_size} "
                f"rope_partial={dec.partial_rotary_factor} "
                f"tie={dec.tie_embeddings}; adapter stack={cfg.adapter_stack} "
                f"hidden={cfg.adapter_hidden}; "
                f"ids pad={cfg.pad_id} eos={cfg.eos_id} "
                f"audio=[{cfg.audio_start_id},{cfg.audio_end_id}]",
            ))
        except Exception as e:
            report.append(_fail("derive", str(e)))
            return report
        native_dir = out or tempfile.mkdtemp(prefix="sonic_ckpt_")
        warnings: list[str] = []
        try:
            convert_hf_checkpoint(
                src, native_dir, cfg, int8=int8, progress=warnings.append
            )
            report.append(_ok("convert", "; ".join(warnings)))
        except Exception as e:
            report.append(_fail("convert", str(e)))
            return report

    # ---- 3: load ----
    try:
        cfg, params, tokenizer = load_checkpoint(native_dir)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        report.append(_ok(
            "load",
            f"{n / 1e9:.2f}B params, tokenizer={type(tokenizer).__name__}",
        ))
    except Exception as e:
        report.append(_fail("load", str(e)))
        return report

    # ---- 4: twin token-exactness (fp32 both sides; int8 trees skip —
    # the torch twin consumes unquantized weights) ----
    if int8:
        report.append(_skip("twin", "int8 tree (twin consumes fp weights)"))
    else:
        try:
            from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram
            from sonicscribe_tpu.models.glm_asr import (
                embed_tokens,
                encode_audio,
                greedy_generate,
            )
            from sonicscribe_tpu.models.tokenizer import build_prompt
            from sonicscribe_tpu.tools.torch_reference import transcribe_torch

            sr = 16000
            t = np.arange(sr // 2) / sr
            probe = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            mel = np.asarray(
                log_mel_spectrogram(probe, MelConfig(n_mels=cfg.encoder.n_mels))
            )
            fp = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
            fp_np = jax.tree.map(np.asarray, fp)
            prompt = build_prompt(tokenizer, cfg)
            n_new = 16
            torch_tokens = transcribe_torch(
                fp_np, cfg, mel, prompt.prefix_ids, prompt.suffix_ids, n_new
            )
            audio_embeds, n_tok = encode_audio(
                fp, cfg, jnp.asarray(mel)[None], jnp.array([mel.shape[0]])
            )
            embeds = jnp.concatenate(
                [
                    embed_tokens(fp, jnp.asarray(prompt.prefix_ids))[None],
                    audio_embeds[:, : int(n_tok[0])],
                    embed_tokens(fp, jnp.asarray(prompt.suffix_ids))[None],
                ],
                axis=1,
            )
            jax_tokens = np.asarray(
                greedy_generate(
                    fp, cfg, embeds, jnp.array([embeds.shape[1]]), n_new
                )
            )[0]
            jt: list[int] = []
            for tok in jax_tokens:
                jt.append(int(tok))
                if tok == cfg.eos_id:
                    break
                if tok == cfg.pad_id:
                    jt.pop()
                    break
            if jt == torch_tokens:
                report.append(_ok("twin", f"token-exact over {len(jt)} tokens"))
            else:
                report.append(_fail(
                    "twin", f"JAX {jt} != torch {torch_tokens}"
                ))
        except Exception as e:
            report.append(_fail("twin", f"{type(e).__name__}: {e}"))

    # ---- 5: mel parity vs transformers ----
    try:
        from transformers import WhisperFeatureExtractor

        from sonicscribe_tpu.audio.mel import MelConfig, log_mel_spectrogram

        mc = MelConfig(n_mels=cfg.encoder.n_mels)
        fe = WhisperFeatureExtractor(
            feature_size=mc.n_mels, sampling_rate=mc.sampling_rate
        )
        rng = np.random.default_rng(0)
        probe = rng.standard_normal(mc.sampling_rate).astype(np.float32) * 0.2
        ours = np.asarray(log_mel_spectrogram(probe, mc)).T  # [n_mels, T]
        theirs = fe(
            probe, sampling_rate=mc.sampling_rate, padding="do_not_pad",
            return_tensors="np",
        )["input_features"][0]
        if ours.shape != theirs.shape:
            raise ValueError(
                f"mel shape mismatch: ours {ours.shape} vs HF {theirs.shape}"
            )
        err = float(np.abs(ours - theirs).max())
        report.append(
            _ok("mel", f"max |diff| = {err:.2e} (tol 1e-3)")
            if err <= 1e-3
            else _fail("mel", f"max |diff| = {err:.2e} > 1e-3")
        )
    except ImportError as e:
        report.append(_skip("mel", f"transformers unavailable: {e}"))
    except Exception as e:
        report.append(_fail("mel", f"{type(e).__name__}: {e}"))

    # ---- 6: golden WAVs ----
    if not wavs:
        report.append(_skip("wav", "no --wav given"))
        return report
    from sonicscribe_tpu.audio.wav import read_wav
    from sonicscribe_tpu.engine.transcriber import Transcriber

    tr = Transcriber(cfg, params, tokenizer)
    expects = expects or []
    for i, path in enumerate(wavs):
        try:
            with open(path, "rb") as f:
                audio, sr = read_wav(f.read())
            r = tr.transcribe(audio, sr, max_new_tokens=max_new_tokens)
            detail = f"{os.path.basename(path)!r} -> {r.text!r}"
            if i < len(expects):
                want = expects[i].strip().lower()
                got = r.text.strip().lower()
                report.append(
                    _ok(f"wav[{i}]", detail)
                    if want == got
                    else _fail(f"wav[{i}]", f"{detail}; expected {want!r}")
                )
            else:
                report.append(_ok(f"wav[{i}]", detail))
        except Exception as e:
            report.append(_fail(f"wav[{i}]", f"{type(e).__name__}: {e}"))
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Convert, load, and parity-check a GLM-ASR checkpoint"
    )
    ap.add_argument("src", help="HF checkpoint dir or native (converted) dir")
    ap.add_argument("--out", help="where to write the converted native "
                                  "checkpoint (default: temp dir)")
    ap.add_argument("--wav", action="append", default=[],
                    help="golden WAV to transcribe (repeatable)")
    ap.add_argument("--expect", action="append", default=[],
                    help="expected transcript for the i-th --wav (repeatable)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--json", action="store_true", help="machine output")
    args = ap.parse_args(argv)

    report = verify(args.src, args.out, args.wav, args.expect, args.int8)
    failed = [r for r in report if r["status"] == "FAIL"]
    if args.json:
        print(json.dumps({"report": report, "passed": not failed}))
    else:
        width = max(len(r["step"]) for r in report)
        for r in report:
            mark = {"ok": "PASS", "FAIL": "FAIL", "skipped": "SKIP"}[r["status"]]
            print(f"  [{mark}] {r['step']:<{width}}  {r['detail']}")
        print(
            f"checkpoint verification: "
            f"{'FAILED' if failed else 'PASSED'} "
            f"({sum(r['status'] == 'ok' for r in report)} ok, "
            f"{len(failed)} failed, "
            f"{sum(r['status'] == 'skipped' for r in report)} skipped)"
        )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
