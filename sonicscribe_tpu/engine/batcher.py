"""Continuous batcher: packs concurrent sessions onto one TPU core.

THE core new engineering of the TPU build (SURVEY.md §2.5, §7 hard-part #1 —
no reference counterpart; the reference serializes every session through one
blocking model call, backend/transcription_manager.py:58).

Design:

- TWO CACHE POOLS (`_CachePool`), each a fixed set of decode slots sharing
  one persistent KV cache [L, rows, max_len, nkv, hd]: the SHORT pool (one
  slot per realtime stream, cache sized to the interim class) and the LONG
  pool (finals / file segments). Requests route by prompt-buffer + budget
  need. The split keeps every program's shapes static AND sized to its
  class — decode cost scales with rows x max_len, so interims never pay
  for the file class's 30 s cache, and a synchronized interim burst from
  all streams admits in ONE wave (the tail collapses to the median).
- PREFILL: one compiled program per (mel bucket, suffix bucket, batch size,
  pool) runs encoder + prompt assembly + prefill and writes each row's KV
  into its slot with `dynamic_update_slice` (donated cache, no copies),
  plus the first greedy token into the slot's device-side output buffer.
  Suffix buckets keep prompts from paying 160-token padding (prefill is
  compute-bound; the default instruction gets a tight bucket).
- DECODE: per pool, one compiled program runs K greedy steps for ALL its
  slots (lax.scan over decode_step) with per-slot logit bias (hotwords, on
  top of an optional base bias). EOS/budget termination and emitted tokens
  are tracked ON DEVICE.
- PIPELINED TICKS: each tick dispatches its programs first, then resolves
  the PREVIOUS tick's parked device results ({VAD probs, per-pool status +
  token rows} in one combined device_get) — the ~27 ms tunnel RTT overlaps
  the current tick's device execution (measured: a d2h fetch does not wait
  for later-dispatched programs). Parked statuses carry per-slot request
  identities so a stale result can never finish a slot's next occupant.
- VAD: pending gate windows from all sessions are stacked and evaluated in
  one batched program per tick (SURVEY.md §2.9 "batched gating op").
- DATA PARALLEL: pass a ("data","model") Mesh and every per-slot/per-stream
  array shards over "data" with replicated params — one GSPMD program, the
  scheduler unchanged (parallel/mesh.py).

Exposes the same async interface as ThreadedEngine (transcribe /
vad_window_prob), so the serving layer swaps engines with a flag.
"""

from __future__ import annotations

import asyncio
import logging
import os as _os
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.engine.transcriber import (
    MAX_SUFFIX_TOKENS,
    Transcriber,
    TranscribeResult,
)
from sonicscribe_tpu.models.config import GlmAsrConfig
from sonicscribe_tpu.models.glm_asr import (
    decode_step,
    embed_tokens,
    prefill_kv,
    verify_step,
)
from sonicscribe_tpu.models.tokenizer import build_prompt
from sonicscribe_tpu.vad.model import WINDOW_SAMPLES

logger = logging.getLogger(__name__)

_DECODE_K_CHOICES = (1, 2, 4, 8, 16, 32, 64)
# status-row flag (verify programs only): positive status + this bit means
# the slot's speculative draft still has unconsumed tokens. Far above any
# n_emitted+1 (MAX_NEW is budget-bounded, << 2^16), never on negatives.
_SPEC_LIVE_FLAG = 1 << 16
# coarse VAD batch ladder: ring-path padding rows are free (device slices,
# no upload) and host-path padding costs ~40 KB/row of upload on the rare
# overflow/threaded path — fewer buckets means fewer compiled programs,
# which is what cold-start warmup is bound by (warmup_phase_s artifact)
_VAD_BATCH_BUCKETS = (1, 4, 16, 64)


def _resolve_quietly(future: asyncio.Future, result) -> None:
    """set_result unless the client already cancelled/closed."""
    if not future.done():
        future.set_result(result)


def _chunked(seq: list, cap: int) -> list[list]:
    """Split to bucket-capped chunks: a lockstep burst from more streams than
    the largest compiled batch bucket must span multiple programs (found as a
    StopIteration crash at 100 realtime streams)."""
    return [seq[i : i + cap] for i in range(0, len(seq), cap)]


# =====================================================================
# jitted programs
# =====================================================================


def assemble_prompt_batch(
    params,
    cfg: GlmAsrConfig,
    mels,  # [B, T_bucket, n_mels]
    n_frames,  # [B] i32
    prefix_ids,  # [P] (shared across the batch)
    suffix_ids,  # [B, MAX_SUFFIX_TOKENS]
    suffix_lens,  # [B] i32
):
    """Batched prompt assembly: one encoder pass for B requests; per-row
    suffix placement at the row's true audio-token offset via vmap'd
    dynamic_update_slice."""
    from sonicscribe_tpu.models.glm_asr import encode_audio

    audio_embeds, n_toks = encode_audio(params, cfg, mels, n_frames)  # [B,A,D]
    B, A, D = audio_embeds.shape
    P = prefix_ids.shape[0]
    MS = suffix_ids.shape[1]
    buf = jnp.zeros((B, P + A + MS, D), audio_embeds.dtype)
    buf = buf.at[:, :P].set(embed_tokens(params, prefix_ids)[None])
    buf = jax.lax.dynamic_update_slice(buf, audio_embeds, (0, P, 0))
    suffix_embeds = embed_tokens(params, suffix_ids)  # [B, MS, D]

    def put(row_buf, s_emb, n_tok):
        return jax.lax.dynamic_update_slice(row_buf, s_emb, (P + n_tok, 0))

    buf = jax.vmap(put)(buf, suffix_embeds, n_toks)
    totals = P + n_toks + suffix_lens
    return buf, totals


def _prefill_common(
    params,
    cfg: GlmAsrConfig,
    mels,
    n_frames,
    prefix_ids,
    suffix_ids,
    suffix_lens,
    cache_k,
    cache_v,
    cache_len,
    last_tok,
    out_tokens,
    n_emitted,
    done,
    bias_full,
    budgets,
    slots,
):
    """Shared core: batched encoder+prefill pass (weights stream from HBM once
    for the whole group), per-row KV writes into the rows' slots, first greedy
    token into the device-side output buffers."""
    buf, totals = assemble_prompt_batch(
        params, cfg, mels, n_frames, prefix_ids, suffix_ids, suffix_lens
    )
    ks, vs, last_logits = prefill_kv(params, cfg, buf, totals)  # [L,B,Lb,...]

    B = mels.shape[0]
    tok0 = jnp.argmax(
        last_logits + bias_full[slots], axis=-1
    ).astype(jnp.int32)  # [B]
    for i in range(B):  # static B, unrolled
        slot = slots[i]
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, ks[:, i : i + 1].astype(cache_k.dtype), (0, slot, 0, 0, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, vs[:, i : i + 1].astype(cache_v.dtype), (0, slot, 0, 0, 0)
        )
        cache_len = cache_len.at[slot].set(totals[i])
        last_tok = last_tok.at[slot].set(tok0[i])
        out_tokens = out_tokens.at[slot].set(0)
        out_tokens = out_tokens.at[slot, 0].set(tok0[i])
        n_emitted = n_emitted.at[slot].set(1)
        done = done.at[slot].set((tok0[i] == cfg.eos_id) | (budgets[slot] <= 1))
    return cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done


@partial(
    jax.jit,
    static_argnames=("cfg",),
    # out_tokens (argnum 11) is not donated — see _decode_k_program
    donate_argnums=(7, 8, 9, 10, 12, 13),
)
def _prefill_slots_program(
    params,
    cfg: GlmAsrConfig,
    mels,  # [B, T_bucket, n_mels]
    n_frames,  # [B] i32
    prefix_ids,  # [P]
    suffix_ids,  # [B, MAX_SUFFIX_TOKENS]
    suffix_lens,  # [B] i32
    cache_k,  # [L, S+1, MAX, nkv, hd]  (donated; row S is the trash slot)
    cache_v,  # (donated)
    cache_len,  # [S+1] i32             (donated)
    last_tok,  # [S+1] i32              (donated)
    out_tokens,  # [S+1, MAX_NEW] i32   (donated)
    n_emitted,  # [S+1] i32             (donated)
    done,  # [S+1] bool                 (donated)
    bias_full,  # [S+1, V] f32
    budgets,  # [S+1] i32
    slots,  # [B] i32 target slot per row (padding rows point at the trash slot)
):
    """Admit B sessions whose mel came from the host (the file path)."""
    return _prefill_common(
        params, cfg, mels, n_frames, prefix_ids, suffix_ids, suffix_lens,
        cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done,
        bias_full, budgets, slots,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "mel_cfg", "n_chunks", "mel_dtype"),
    # out_tokens (argnum 12) is not donated — see _decode_k_program
    donate_argnums=(8, 9, 10, 11, 13, 14),
)
def _prefill_ring_program(
    params,
    cfg: GlmAsrConfig,
    mel_cfg,
    ring,  # [streams+1, 2R, 1024] i16
    stream_idx,  # [B] i32
    start_chunk,  # [B] i32
    chunk_count,  # [B] i32 true chunks (<= n_chunks)
    prefix_ids,  # [P]
    cache_k,
    cache_v,
    cache_len,
    last_tok,
    out_tokens,
    n_emitted,
    done,
    bias_full,
    budgets,
    slots,  # [B] i32
    suffix_ids,  # [B, MAX_SUFFIX_TOKENS]
    suffix_lens,  # [B] i32
    n_chunks: int,
    mel_dtype=jnp.float32,
):
    """Admit B STREAM sessions straight from the device audio ring: slice +
    peak-normalize + batched mel + encoder + prefill, zero audio upload."""
    from sonicscribe_tpu.engine.ring import ring_prompt_inputs

    mels, n_frames = ring_prompt_inputs(
        ring, cfg, mel_cfg, stream_idx, start_chunk, chunk_count, n_chunks
    )
    return _prefill_common(
        params, cfg, mels.astype(mel_dtype), n_frames, prefix_ids,
        suffix_ids, suffix_lens,
        cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done,
        bias_full, budgets, slots,
    )


def _book_step(cfg, logits, bias, dn, tok, out, n, bud, idx, max_new):
    """Per-step device-side bookkeeping shared by _decode_k_program and
    _decode_k_dual_program: greedy pick with bias, frozen-slot token hold,
    output append, EOS/budget termination."""
    nxt = jnp.argmax(logits + bias, -1).astype(jnp.int32)
    nxt = jnp.where(dn, tok, nxt)  # frozen slots keep their token
    pos = jnp.minimum(n, max_new - 1)
    cur = out[idx, pos]
    out = out.at[idx, pos].set(jnp.where(dn, cur, nxt))
    n = jnp.where(dn, n, n + 1)
    dn = dn | (nxt == cfg.eos_id) | (n >= bud)
    return nxt, out, n, dn


@partial(
    jax.jit,
    static_argnames=("cfg", "k_steps", "use_flash", "rows"),
    # out_tokens (argnum 6) is NOT donated: the scheduler parks the output
    # handle and fetches finished rows one tick later, concurrently with the
    # next decode program — donation would tie the fetch to that program
    donate_argnums=(2, 3, 4, 5, 7, 8),
)
def _decode_k_program(
    params,
    cfg: GlmAsrConfig,
    cache_k,
    cache_v,
    cache_len,
    last_tok,  # [S] i32
    out_tokens,  # [S, MAX_NEW] i32
    n_emitted,  # [S] i32
    done,  # [S] bool
    bias,  # [S, V] f32
    budgets,  # [S] i32
    k_steps: int,
    use_flash: bool = False,
    rows: int | None = None,
):
    """K greedy steps for all slots, fully device-side bookkeeping.

    Returns new state + status [S] i32 where status = (n_emitted+1) signed
    negative when done — ONE tiny host fetch tells the scheduler everything.

    `rows`: static occupied-prefix count — compute only slots [0:rows].
    Decode at serving batch sizes is HBM-bound and the per-step KV read
    scales with rows x max_len (nano long pool: 4.7 GB full vs 3.4 GB of
    weights), while slot allocation is lowest-free-first, so the active
    slots live in a prefix. The caller picks the smallest compiled rows
    covering the highest active slot; excluded rows are untouched (their
    updates are frozen no-ops in the full program anyway). The prefix
    slices fuse into the attention read and the dynamic_update_slice at
    offset 0 aliases the donated carry in place, so there is no
    materialized copy of the excluded rows (measured: ROWS_DECODE_BENCH).
    rows=None runs the full pool (identical to the pre-rows program).
    """
    S, MAX_NEW = out_tokens.shape
    R = S if rows is None else min(rows, S)
    b_idx = jnp.arange(R)
    bias_r = bias[:R]
    bud_r = budgets[:R]
    zero5 = (0, 0, 0, 0, 0)

    def step(carry, _):
        ck, cv, cl, tok, out, n, dn = carry
        cache = {"k": ck[:, :R], "v": cv[:, :R], "len": cl[:R]}
        cache, logits = decode_step(
            params, cfg, cache, tok[:R], active=~dn[:R], use_flash=use_flash
        )
        ck = jax.lax.dynamic_update_slice(ck, cache["k"], zero5)
        cv = jax.lax.dynamic_update_slice(cv, cache["v"], zero5)
        cl = jax.lax.dynamic_update_slice(cl, cache["len"], (0,))
        nxt, out, n_r, dn_r = _book_step(
            cfg, logits, bias_r, dn[:R], tok[:R], out, n[:R], bud_r,
            b_idx, MAX_NEW,
        )
        tok = jax.lax.dynamic_update_slice(tok, nxt, (0,))
        n = jax.lax.dynamic_update_slice(n, n_r, (0,))
        dn = jax.lax.dynamic_update_slice(dn, dn_r, (0,))
        return (ck, cv, cl, tok, out, n, dn), None

    (cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done), _ = (
        jax.lax.scan(
            step,
            (cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done),
            None,
            length=k_steps,
        )
    )
    status = jnp.where(done, -(n_emitted + 1), n_emitted + 1)
    return (
        cache_k,
        cache_v,
        cache_len,
        last_tok,
        out_tokens,
        n_emitted,
        done,
        status,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "w", "n_rounds", "rows"),
    # out_tokens (argnum 6) is NOT donated — see _decode_k_program
    donate_argnums=(2, 3, 4, 5, 7, 8, 12),
)
def _verify_rounds_program(
    params,
    cfg: GlmAsrConfig,
    cache_k,
    cache_v,
    cache_len,
    last_tok,  # [S] i32
    out_tokens,  # [S, MAX_NEW] i32
    n_emitted,  # [S] i32
    done,  # [S] bool
    bias,  # [S, V] f32
    budgets,  # [S] i32
    draft,  # [S, MAX_DRAFT] i32 (NOT donated: rounds only read it)
    draft_pos,  # [S] i32 (donated)
    draft_len,  # [S] i32
    w: int,  # draft tokens verified per round (W1 = w+1 query positions)
    n_rounds: int,
    rows: int | None = None,
):
    """`n_rounds` speculative verification rounds for the whole pool —
    the speculative-finals fast path (DRAFTED slots emit up to w+1 tokens
    per weights-read; undrafted actives degenerate to 1 token/round, the
    same HBM cost as a decode step).

    Per round, per slot: feed [last_tok, d_0..d_{w-1}] through verify_step
    (one forward, w+1 causal query positions), greedy-pick g_j at every
    position, accept the longest prefix where d_j == g_j, and emit
    d_0..d_{a-1} plus the correction/extension g_a — EXACTLY the tokens
    sequential greedy decode would emit (lossless; test_spec_decode.py).
    First emitted EOS and the slot budget truncate the emission; on a
    draft mismatch the rest of the draft is discarded (it predicted a
    continuation greedy rejected). All bookkeeping — acceptance cumprod,
    EOS scan, budget clamp, out_tokens scatter, cache_len advance, draft
    cursor — is device-side, so rounds chain inside one lax.scan with no
    host round trips, preserving the scheduler's pipelined-tick contract
    (same ±(n+1) status rows as _decode_k_program).

    `rows`: occupied-prefix slicing, same contract as _decode_k_program.
    """
    S, MAX_NEW = out_tokens.shape
    MAXD = draft.shape[1]
    R = S if rows is None else min(rows, S)
    b_idx = jnp.arange(R)
    j_idx = jnp.arange(w + 1)
    bias_r = bias[:R]
    bud_r = budgets[:R]
    draft_r = draft[:R]
    dlen_r = draft_len[:R]
    pad = jnp.int32(cfg.pad_id)
    zero5 = (0, 0, 0, 0, 0)

    def round_fn(carry, _):
        ck, cv, cl, tok, out, n, dn, dpos = carry
        tok_r, n_r, dn_r, dpos_r = tok[:R], n[:R], dn[:R], dpos[:R]
        # next w draft tokens per slot (device-resident draft)
        idx = dpos_r[:, None] + j_idx[None, :w]
        have = idx < dlen_r[:, None]
        dtoks = jnp.where(
            have, draft_r[b_idx[:, None], jnp.clip(idx, 0, MAXD - 1)], pad
        )
        inputs = jnp.concatenate([tok_r[:, None], dtoks], axis=1)  # [R, w+1]
        cache = {"k": ck[:, :R], "v": cv[:, :R], "len": cl[:R]}
        cache, logits = verify_step(params, cfg, cache, inputs, active=~dn_r)
        ck = jax.lax.dynamic_update_slice(ck, cache["k"], zero5)
        cv = jax.lax.dynamic_update_slice(cv, cache["v"], zero5)
        g = jnp.argmax(logits + bias_r[:, None, :], -1).astype(jnp.int32)

        # longest accepted draft prefix
        match = have & (dtoks == g[:, :w])
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
        a = acc.sum(axis=1)  # [R]
        # emitted candidates e_0..e_a: draft for j<a, greedy correction at a
        dt_pad = jnp.concatenate([dtoks, dtoks[:, -1:]], axis=1)  # [R, w+1]
        e = jnp.where(j_idx[None, :] < a[:, None], dt_pad, g)
        # first EOS within the emitted window truncates
        eos_at = (e == cfg.eos_id) & (j_idx[None, :] <= a[:, None])
        any_eos = eos_at.any(axis=1)
        first_eos = jnp.argmax(eos_at, axis=1)
        m = jnp.where(any_eos, first_eos + 1, a + 1)
        m = jnp.minimum(m, jnp.maximum(bud_r - n_r, 0))
        m = jnp.where(dn_r, 0, m)

        # scatter the emitted tokens into out at n..n+m-1
        wpos = jnp.minimum(n_r[:, None] + j_idx[None, :], MAX_NEW - 1)
        keep = j_idx[None, :] < m[:, None]
        cur = out[b_idx[:, None], wpos]
        out = out.at[b_idx[:, None], wpos].set(jnp.where(keep, e, cur))

        n2 = n_r + m
        emitted_eos = (eos_at & keep).any(axis=1)
        dn2 = dn_r | emitted_eos | (n2 >= bud_r)
        # valid cache grows by the emitted count (inputs x_0..x_{m-1});
        # the last emitted token's K/V is NOT in cache — it is next
        # round's x_0, exactly like decode_step's contract
        cl = cl.at[:R].set(jnp.where(m > 0, cl[:R] + m, cl[:R]))
        tok2 = jnp.where(m > 0, e[b_idx, jnp.maximum(m - 1, 0)], tok_r)
        # draft cursor: consume accepted tokens; a mismatch (a < available)
        # invalidates the remainder
        avail = jnp.maximum(jnp.minimum(w, dlen_r - dpos_r), 0)
        diverged = (a < avail) & ~dn_r
        dpos2 = jnp.where(diverged, dlen_r, dpos_r + a)

        tok = jax.lax.dynamic_update_slice(tok, tok2, (0,))
        n = jax.lax.dynamic_update_slice(n, n2, (0,))
        dn = jax.lax.dynamic_update_slice(dn, dn2, (0,))
        dpos = jax.lax.dynamic_update_slice(dpos, dpos2, (0,))
        return (ck, cv, cl, tok, out, n, dn, dpos), None

    (cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done,
     draft_pos), _ = jax.lax.scan(
        round_fn,
        (cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done,
         draft_pos),
        None,
        length=n_rounds,
    )
    # not-done slots whose draft still has unconsumed tokens carry the
    # spec-live flag in their status row; the host clears `drafted` when it
    # sees a positive status WITHOUT it, so draft-exhausted slots return to
    # the plain k-escalated decode ladder (up to long_idle_k_cap steps per
    # dispatch vs this program's <= max(verify_rounds_choices) rounds)
    spec_live = (~done) & (draft_pos < draft_len)
    status = jnp.where(
        done,
        -(n_emitted + 1),
        n_emitted + 1 + jnp.where(spec_live, _SPEC_LIVE_FLAG, 0),
    )
    return (
        cache_k,
        cache_v,
        cache_len,
        last_tok,
        out_tokens,
        n_emitted,
        done,
        draft_pos,
        status,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "k_steps"),
    # out_tokens (argnums 6, 15) are not donated — see _decode_k_program
    donate_argnums=(2, 3, 4, 5, 7, 8, 11, 12, 13, 14, 16, 17),
)
def _decode_k_dual_program(
    params,
    cfg: GlmAsrConfig,
    a_ck, a_cv, a_cl, a_tok, a_out, a_n, a_dn, a_bias, a_bud,  # short pool
    b_ck, b_cv, b_cl, b_tok, b_out, b_n, b_dn, b_bias, b_bud,  # long pool
    k_steps: int,
):
    """K greedy steps for BOTH cache pools in ONE program.

    Decode is weight-bandwidth-bound; when the short (interim) and long
    (final/file) pools are active in the same tick, separate programs stream
    the ~3.4 GB of layer weights from HBM twice per step-round. This program
    runs the step via decode_step_dual (models/glm_asr.py): one layer scan,
    weights read once, row-independent math on the concatenated batch,
    attention split per pool. Bookkeeping is identical to _decode_k_program,
    per pool. Returns both pools' new state + status rows.
    """
    from sonicscribe_tpu.models.glm_asr import decode_step_dual

    Sa, MAXN_A = a_out.shape
    Sb, MAXN_B = b_out.shape
    ia, ib = jnp.arange(Sa), jnp.arange(Sb)

    def step(carry, _):
        (ack, acv, acl, atok, aout, an, adn,
         bck, bcv, bcl, btok, bout, bn, bdn) = carry
        ca = {"k": ack, "v": acv, "len": acl}
        cb = {"k": bck, "v": bcv, "len": bcl}
        ca, la, cb, lb = decode_step_dual(
            params, cfg, ca, atok, cb, btok, active_a=~adn, active_b=~bdn
        )
        atok, aout, an, adn = _book_step(
            cfg, la, a_bias, adn, atok, aout, an, a_bud, ia, MAXN_A
        )
        btok, bout, bn, bdn = _book_step(
            cfg, lb, b_bias, bdn, btok, bout, bn, b_bud, ib, MAXN_B
        )
        return (ca["k"], ca["v"], ca["len"], atok, aout, an, adn,
                cb["k"], cb["v"], cb["len"], btok, bout, bn, bdn), None

    (a_ck, a_cv, a_cl, a_tok, a_out, a_n, a_dn,
     b_ck, b_cv, b_cl, b_tok, b_out, b_n, b_dn), _ = jax.lax.scan(
        step,
        (a_ck, a_cv, a_cl, a_tok, a_out, a_n, a_dn,
         b_ck, b_cv, b_cl, b_tok, b_out, b_n, b_dn),
        None,
        length=k_steps,
    )
    status_a = jnp.where(a_dn, -(a_n + 1), a_n + 1)
    status_b = jnp.where(b_dn, -(b_n + 1), b_n + 1)
    return (
        a_ck, a_cv, a_cl, a_tok, a_out, a_n, a_dn, status_a,
        b_ck, b_cv, b_cl, b_tok, b_out, b_n, b_dn, status_b,
    )


def _make_vad_batch_program(vad, n_sub: int):
    @jax.jit
    def run(params, windows, states):
        # windows: [B, n_sub, 512] -> max prob over sub-windows per stream
        def step(carry, w):
            states, best = carry
            probs, states = vad.forward(params, w, states)
            return (states, jnp.maximum(best, probs)), None

        B = windows.shape[0]
        (states, best), _ = jax.lax.scan(
            step,
            (states, jnp.zeros((B,), jnp.float32)),
            jnp.swapaxes(windows, 0, 1),
        )
        return best, states

    return run


# =====================================================================
# engine
# =====================================================================


@dataclass
class _SlotState:
    request: Any = None
    budget: int = 0
    active: bool = False
    steps_seen: int = 0  # decode steps dispatched while this slot was active
    drafted: bool = False  # admitted with a speculative draft (verify path)
    # host estimate of remaining USEFUL verify rounds: ceil(draft_len/w)
    # at admit, minus rounds dispatched. The parked-status _SPEC_LIVE_FLAG
    # arrives a tick late (pipelining), so this countdown bounds how long a
    # spent draft can pin the slot to the verify ladder
    spec_rounds: int = 0


@dataclass
class _CachePool:
    """One decode class: its own KV cache + slot pool + compiled programs.

    The engine runs TWO pools — "short" for the latency-critical interim
    class (small cache, one slot per realtime stream, so a synchronized
    burst of interims admits in ONE wave and finishes in ONE k-step
    program) and "long" for finals / file segments. Splitting by cache
    requirement keeps every program's shapes static AND sized to its class:
    decode cost scales with rows x max_len, so interims never pay for the
    file class's 30 s cache rows, and a burst never splits into waves that
    double the tail. (Measured motivation: bench_kcap history — one shared
    pool put the 50-stream burst's second wave at ~480 ms p95.)
    """

    name: str
    max_len: int
    trash_slot: int  # == n_slots; rows beyond it are dp padding
    # occupied-prefix decode ladder (ROWS_DECODE_BENCH): sorted static row
    # counts the decode grid compiles in addition to the full pool. Slot
    # alloc is lowest-free-first, so active slots cluster in a prefix; the
    # dispatch picks the smallest compiled rows covering the highest active
    # slot and the program's per-step KV read shrinks proportionally
    # (measured k=8 at nano 33x2560: rows=4 113 ms / 8 159 / 16 249 vs
    # full 283). Empty = always full (short pool: KV is negligible vs
    # weights; mesh engines: the slot axis is sharded).
    rows_ladder: tuple = ()
    cache_k: Any = None
    cache_v: Any = None
    cache_len: Any = None
    last_tok: Any = None
    out_tokens: Any = None
    n_emitted: Any = None
    done: Any = None
    bias: Any = None
    budgets: Any = None
    # speculative-finals draft state (device-resident so verify rounds chain
    # without host round trips): draft token buffer + per-slot cursor/length
    draft: Any = None
    draft_pos: Any = None
    draft_len: Any = None
    bias_dirty: list = field(default_factory=list)
    slots: list = field(default_factory=list)
    compiled_prefill: set = field(default_factory=set)
    compiled_ring_prefill: set = field(default_factory=set)
    # (k, rows) decode programs known-compiled; _pick_rows only returns a
    # prefix rung whose (k, rung) is registered, so background (fast)
    # warmup can defer rows variants without risking a mid-serving JIT
    compiled_decode: set = field(default_factory=set)
    # (n_rounds, rows) verify programs known-compiled (speculative finals);
    # the dispatch falls back to plain k-step decode until registered
    compiled_verify: set = field(default_factory=set)

    @property
    def n_active(self) -> int:
        return sum(s.active for s in self.slots)

    @property
    def free(self) -> int:
        return len(self.slots) - self.n_active


@dataclass
class _TranscribeReq:
    audio: np.ndarray
    sample_rate: int
    max_new_tokens: int
    hotwords: Optional[list[str]]
    future: asyncio.Future
    t_enqueue: float
    # resolved-pool hint: set when prep discovers the true mel bucket routes
    # differently than the pre-resample size estimate (prevents a re-route
    # bounce loop between the estimate and the real bucket)
    pool_hint: Any = None
    t_admit: float = 0.0  # set when the prefill program is dispatched
    # speculative draft: the session's predicted token sequence (usually the
    # banked interim tokens); verified losslessly, never trusted
    draft_tokens: Any = None
    # unconfirmed speculative-ENDPOINT final (eager finals): the session has
    # bet that speech ended, the gate has not confirmed it yet. While True
    # the long pool must not k-escalate on its behalf (a lost bet's k=32
    # program blocks the resumed speech's interims, EAGER_FINALS_BENCH
    # worstcase interim p95). Flipped False by confirm_speculative().
    speculative: bool = False


@dataclass
class _VadReq:
    audio: np.ndarray
    state: Any
    future: asyncio.Future


@dataclass
class _VadRingReq:
    stream_idx: int
    start_chunk: int
    future: asyncio.Future


@dataclass
class _RingTranscribeReq:
    stream_idx: int
    start_chunk: int
    chunk_count: int
    max_new_tokens: int
    hotwords: Optional[list[str]]
    duration_s: float
    future: asyncio.Future
    t_enqueue: float
    t_admit: float = 0.0  # set when the prefill program is dispatched
    draft_tokens: Any = None  # speculative draft (see _TranscribeReq)
    speculative: bool = False  # unconfirmed eager final (see _TranscribeReq)


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _slot_write_program(
    budgets,  # [S] i32 (donated)
    draft,  # [S, W] i32 (donated)
    draft_len,  # [S] i32 (donated)
    draft_pos,  # [S] i32 (donated)
    idx,  # [B] i32 slot indices (padding rows -> trash slot)
    budget_vals,  # [B] i32
    draft_rows,  # [B, W] i32
    draft_lens,  # [B] i32
):
    """ONE fused device write of an admit group's per-slot state (budget +
    speculative draft buffers). The eager path is four separate `.at[].set`
    dispatches per group; on the tunneled runtime every dispatch costs host
    serialization + an enqueue round trip, and the admit phase is a
    measured term of the tick (INTERIM_BENCH admit_ms). Behavior-identical
    to the eager writes — flag `fuse_slot_writes`, A/B'd in MIXED_BENCH.
    Writes to the pool's trash slot (padding rows) are harmless: the slot
    is never activated or reaped, matching the prefill path's padding."""
    budgets = budgets.at[idx].set(budget_vals)
    draft = draft.at[idx].set(draft_rows)
    draft_len = draft_len.at[idx].set(draft_lens)
    draft_pos = draft_pos.at[idx].set(jnp.zeros_like(draft_lens))
    return budgets, draft, draft_len, draft_pos


class BatchedEngine:
    """Continuous-batching engine; same interface as ThreadedEngine."""

    def __init__(
        self,
        transcriber: Transcriber,
        vad,
        slots: int = 8,
        max_decode_tokens: int = 256,
        cache_dtype=None,
        n_streams: int = 64,
        cache_len: Optional[int] = None,
        mesh=None,
        flash_decode: str = "auto",
        base_logit_bias=None,
        fuse_dual_decode: bool = False,
    ):
        """flash_decode: "auto" | "on" | "off" — route decode attention
        through the Pallas flash-decode kernel (ops/decode_attention.py),
        which reads only the OCCUPIED KV blocks instead of the whole padded
        cache. Measured on the real v5e (tools/bench_flash.py, nano, 50
        slots): the kernel is 0.6-0.9x of the XLA path at every occupancy —
        per-slot decode work is too small for the per-grid-step overhead —
        so "auto" resolves to OFF and the engine attacks padded-cache
        bandwidth with the short/long KV pool split instead.

        mesh: optional jax.sharding.Mesh with a "data" axis. When given,
        the engine runs DATA-PARALLEL over the mesh (parallel/mesh.py design):
        params replicated on every chip, every per-slot/per-stream array
        sharded over "data", one GSPMD program — the scheduler is unchanged.
        Slot/stream row counts are rounded up to a multiple of the data
        degree; the extra rows are permanently-done padding."""
        self.transcriber = transcriber
        self.vad = vad
        self.cfg = transcriber.cfg
        self.S = slots
        self.MAX_NEW = max_decode_tokens
        self.mesh = mesh
        dp = int(mesh.shape["data"]) if mesh is not None else 1
        self.data_parallel = dp

        def _rup(n: int) -> int:  # round up to the data-parallel degree
            return ((n + dp - 1) // dp) * dp

        if mesh is not None:
            from sonicscribe_tpu.parallel.mesh import (
                batch_sharding,
                replicate_params,
                shard_params_tp,
            )

            def _shard(x, axis=0):
                return jax.device_put(x, batch_sharding(mesh, x.ndim, axis=axis))

            if int(mesh.shape.get("model", 1)) > 1:
                # dp x tp: weight matrices shard over "model"
                # (Megatron-style column/row pairs, parallel/mesh.py); GSPMD
                # inserts the psum at each row-parallel contraction. Per-slot
                # state stays sharded over "data" and replicated over
                # "model". Token parity: test_parallel.py.
                transcriber.params = shard_params_tp(transcriber.params, mesh)
            else:
                transcriber.params = replicate_params(transcriber.params, mesh)
            if getattr(vad, "params", None) is not None:
                vad.params = replicate_params(vad.params, mesh)
        else:

            def _shard(x, axis=0):
                return x

        self._shard = _shard

        dec = self.cfg.decoder
        max_audio_tokens = max(transcriber.buckets) // self.cfg.frames_per_audio_token
        self.max_prompt = 3 + max_audio_tokens + MAX_SUFFIX_TOKENS
        # cache_len may be overridden upward so engines with different bucket
        # sets share identical decode-program shapes (one compile)
        long_max_len = max(cache_len or 0, self.max_prompt + max_decode_tokens)
        dtype = cache_dtype or jax.tree.leaves(transcriber.params)[0].dtype
        if dtype == jnp.int8:  # quantized params: cache stays bf16
            dtype = jnp.bfloat16
        self.use_flash = flash_decode == "on"
        # fused dual-pool decode: when both pools are active in a tick, one
        # program streams the weights once for both (see
        # _decode_k_dual_program). Measured on the v5e (DUAL_DECODE_BENCH,
        # MIXED_BENCH): the long pool's per-step KV read lands on the INTERIM
        # critical path (50-stream p95 261->394 ms) — separate programs let
        # the short program finish and be fetched first — and even the
        # intended mixed file+stream scenario showed no file-side win at nano
        # scale (file wall 2.24->2.22 s, interim p95 worse). Default OFF;
        # the knob exists for much larger models where the weight stream
        # dominates both pools' KV reads.
        self.fuse_dual = bool(fuse_dual_decode) and not self.use_flash
        # base additive logit bias applied to EVERY slot (benches suppress
        # EOS/pad with it; production could damp special tokens)
        self._base_bias = (
            None if base_logit_bias is None
            else jnp.asarray(base_logit_bias, jnp.float32)
        )

        def make_pool(
            name: str, n_slots: int, max_len: int, out_width: int
        ) -> _CachePool:
            # slot index n_slots is the TRASH slot: padding rows of batched
            # prefills land there; it is permanently done and never
            # scheduled. Under data parallelism rows is rounded up so the
            # slot axis shards evenly.
            if self.use_flash:
                # the flash kernel iterates 128-position KV blocks
                max_len = ((max_len + 127) // 128) * 128
            rows = _rup(n_slots + 1)
            shape = (dec.n_layers, rows, max_len, dec.n_kv_heads, dec.head_dim)
            return _CachePool(
                name=name,
                max_len=max_len,
                trash_slot=n_slots,
                cache_k=_shard(jnp.zeros(shape, dtype), axis=1),
                cache_v=_shard(jnp.zeros(shape, dtype), axis=1),
                cache_len=_shard(jnp.zeros((rows,), jnp.int32)),
                last_tok=_shard(jnp.zeros((rows,), jnp.int32)),
                # out_width bounds the per-tick token fetch: the short pool's
                # buffer is ~16x narrower, which matters on RTT-bound links
                out_tokens=_shard(jnp.zeros((rows, out_width), jnp.int32)),
                n_emitted=_shard(jnp.zeros((rows,), jnp.int32)),
                done=_shard(jnp.ones((rows,), bool)),
                # host-side dirty tracking: a hotword bias row is ~240 KB;
                # uploading one per admit saturates tunnel h2d bandwidth, so
                # clean rows are reset on device and only hotword rows upload
                bias=_shard(
                    jnp.zeros((rows, dec.vocab_size), jnp.float32)
                    + (0.0 if self._base_bias is None else self._base_bias[None])
                ),
                budgets=_shard(jnp.zeros((rows,), jnp.int32)),
                draft=_shard(
                    jnp.full((rows, max(out_width, 1)), self.cfg.pad_id,
                             jnp.int32)
                ),
                draft_pos=_shard(jnp.zeros((rows,), jnp.int32)),
                draft_len=_shard(jnp.zeros((rows,), jnp.int32)),
                bias_dirty=[False] * rows,
                slots=[_SlotState() for _ in range(n_slots)],
            )

        # suffix buckets: the instruction suffix is padded to a STATIC width
        # per compiled program. Padding everything to MAX_SUFFIX_TOKENS (160)
        # made prefill compute-bound on padding (a ~40-token interim prompt
        # ran 179 decoder positions, measured 60 ms per B=16 prefill), so the
        # default no-hotword suffix gets a tight bucket and only
        # hotword-bearing prompts pay the 160-wide one.
        base_suffix = len(build_prompt(transcriber.tokenizer, self.cfg).suffix_ids)
        sb0 = min(MAX_SUFFIX_TOKENS, ((base_suffix + 2 + 7) // 8) * 8)
        self.suffix_buckets = (
            (sb0, MAX_SUFFIX_TOKENS) if sb0 < MAX_SUFFIX_TOKENS else (sb0,)
        )

        # short pool: the interim class — smallest mel bucket + the default
        # suffix bucket + a small token budget; one slot per realtime stream
        # so a synchronized interim burst admits in ONE wave (sessions hold
        # <=1 decode in flight each)
        self.short_budget = min(16, max_decode_tokens)
        smallest_prompt = (
            3
            + min(transcriber.buckets) // self.cfg.frames_per_audio_token
            + self.suffix_buckets[0]
        )
        self.long = make_pool("long", slots, long_max_len, max_decode_tokens)
        self.short = make_pool(
            "short", n_streams, smallest_prompt + self.short_budget,
            self.short_budget,
        )
        if mesh is None:
            # occupied-prefix decode (see _CachePool.rows_ladder): long-pool
            # only — the short pool's cache is too small to matter and a
            # sharded slot axis cannot prefix-slice. Rungs 1/4/16: a SINGLE
            # active final or file segment (the common production case —
            # one upload, one utterance ending) decodes at B=1 cost; 4 and
            # 16 cover small and mid final waves; denser rungs measured
            # diminishing returns per compile (ROWS_DECODE_BENCH: 16 is
            # already within 14% of full).
            self.long.rows_ladder = tuple(
                r for r in (1, 4, 16) if r < len(self.long.slots) + 1
            )
        # speculative finals (verify_step): drafted long-pool requests
        # verify spec_w draft tokens per weights-read instead of 1-token
        # steps — lossless (greedy-exact), tested in test_spec_decode.py.
        # Works under a data-parallel mesh too: the verify program indexes
        # the slot axis exactly like _decode_k_program (identity-row
        # gathers/scatters), and the rows ladder is already empty under a
        # mesh, so only the full-rows variant is ever dispatched
        # (mesh parity: test_parallel.py).
        self.speculative = True
        self.spec_w = 8
        self.verify_rounds_choices = (1, 2, 4, 8)
        # adaptive gate: measured draft acceptance (matching-prefix fraction,
        # EMA over finished drafted requests). Below the floor, drafts are
        # RECEIVED but not SPENT (no verify rounds) — and since acceptance is
        # measured against the plain greedy output too (what verification
        # would have compared), the EMA recovers by itself when the workload
        # turns predictable again. Real checkpoints sit high (interims
        # transcribed the same audio); the floor exists for the regimes
        # where interim/final outputs genuinely diverge.
        self.spec_accept_ema = 1.0
        self.spec_accept_min = 0.35
        # eager (speculative-endpoint) finals: measured bet-confirmation
        # rate, same adaptive-gate philosophy as spec_accept_ema (see
        # eager_ok/eager_outcome). Outcomes FOLD into the EMA at most once
        # per gate window (eager_window_s): on a lockstep workload a single
        # wave of 50 synchronized confirmations would otherwise pump the EMA
        # 0 -> ~1 in one burst and reopen the launch/escalation floodgate to
        # 50 full-budget bets that all lose (measured: 11-70 s interim p95
        # spikes on the drifting worst case, EAGER_FINALS_BENCH). One
        # window's wave = one observation of its mean outcome.
        self.eager_accept_ema = 1.0
        self.eager_accept_min = 0.5
        self.eager_window_s = 0.64  # 0 -> fold every outcome (tests)
        self._eager_pending: list[bool] = []
        self._eager_fold_t = time.perf_counter()
        self._eager_probe = 0
        # speculation may only spend SLACK device time: when the interim
        # class is already queueing (oversubscribed — e.g. 100 streams on
        # one chip), eager bets' prefill+decode thrash compounds the
        # congestion (measured: 100-stream interim p50 322 -> 738 ms,
        # committed 2.0 -> 8.0 s with the gate absent, SCALE_BENCH).
        # short_queue_ema tracks admission wait per reaped interim; above
        # the budget the launch gate closes outright. Initialized ABOVE the
        # budget: speculation must prove slack exists (one healthy interim
        # wave decays it under budget in ~1 s) rather than thrash during the
        # measurement transient — at 100 streams the open-gate transient
        # alone cost ~37 ms of interim p50 (SCALE_BENCH re-record).
        # (r4 simplification: a 2.5-5 s PEAK-HOLD memory used to back this
        # EMA up on periodic workloads where it decayed between congestion
        # waves — but every measured failure it guarded (the 100-stream
        # reopen-every-cycle thrash, 11 s interim p95) happened with live
        # streams outnumbering long slots, which the structural rule in
        # eager_ok now denies outright. One signal per failure mode:
        # EMA = sub-structural congestion, structural rule = oversubscribed
        # pool. docs/ENGINE.md "Eager-finals launch gate" has the invariant.)
        self.eager_queue_budget_ms = 75.0
        self.short_queue_ema = 2.0 * self.eager_queue_budget_ms
        self._warmed = False  # set by warmup(); gates compiled-grid-only dispatch
        # watchdog: a scheduler tick blocked longer than this dumps all
        # thread stacks to the log (diagnosis only; the tick keeps running)
        self.tick_stall_dump_s = 60.0
        # ...and give up entirely after this long: fail every in-flight
        # future and crash the scheduler (clients get errors, /health goes
        # dead, the supervisor restarts the process) instead of hanging
        # every session forever. Observed for real in r4: the device
        # runtime wedged for >1 h after sustained load — the stuck fetch
        # thread itself cannot be cancelled, so a process restart is the
        # actual remedy; this bounds how long sessions wait to learn it.
        self.tick_stall_abort_s = 600.0
        self.pools = (self.short, self.long)
        # the SHORT pool's k ladder derives from short_budget: _pick_k picks
        # the smallest choice >= min remaining <= short_budget-1, so the
        # smallest power-of-two covering that is < 2*short_budget — if
        # short_budget ever grows, the compiled grid grows with it instead
        # of a mid-serving JIT stall (ADVICE r2). short_budget-1 itself is
        # in the ladder: a fresh interim needs exactly budget-1 more steps
        # after prefill's first token, so the common wave runs 14 steps
        # instead of rounding up to 16. The fused dual program shares this
        # ladder (its k is the short pool's pick) and the dispatch path
        # additionally clamps to the largest compiled choice.
        self.dual_k_choices = tuple(sorted(
            {c for c in _DECODE_K_CHOICES if c < 2 * max(self.short_budget, 1)}
            | {max(1, self.short_budget - 1)}
        ))

        # (bucket, B) prefill-program sizes compiled at warmup; groups are
        # split to compiled sizes at runtime so no request ever pays a
        # surprise multi-second XLA compile. The ladder extends to 32 for
        # big stream counts: at 100 synchronized streams an interim wave
        # split into B<=16 programs was prefill-serialization-bound
        # (SCALE_BENCH r2: p50 321 ms; the wave is one VAD burst, so most
        # of it sits in the backlog of a single tick)
        self.prefill_batch_choices = tuple(
            b for b in (1, 2, 4, 8, 16, 32) if b <= max(1, slots, n_streams)
        )

        self._vad_program = None
        self._vad_n_sub = -1
        self._requests: asyncio.Queue[_TranscribeReq] = asyncio.Queue()
        self._vad_requests: asyncio.Queue[_VadReq] = asyncio.Queue()
        self._wake = asyncio.Event()

        # ---- device audio ring (realtime streams; see engine/ring.py) ----
        from sonicscribe_tpu.engine.ring import (
            CHUNK_SAMPLES,
            RING_CHUNKS,
            make_vad_ring_program,
        )

        self.has_ring = True
        self.N_STREAMS = n_streams
        self.trash_stream = n_streams
        self.ring = _shard(
            jnp.zeros((_rup(n_streams + 1), 2 * RING_CHUNKS, CHUNK_SAMPLES), jnp.int16)
        )
        self._free_streams = list(range(n_streams))
        # device-resident; padded so the stream axis shards evenly
        self.vad_states = jax.tree.map(_shard, vad.init_state(_rup(n_streams)))
        self._vad_ring_program = make_vad_ring_program(
            vad, window_chunks=10
        )
        self._ingest_pending: list[tuple[int, int, np.ndarray]] = []
        self._vad_ring_requests: asyncio.Queue[_VadRingReq] = asyncio.Queue()
        self._ring_requests: asyncio.Queue[_RingTranscribeReq] = asyncio.Queue()
        # chunk-bucket sizes: frame buckets are multiples of 128 frames
        # = 20 chunks exactly (128 * 160 / 1024)
        self.chunk_buckets = sorted(
            b * 160 // CHUNK_SAMPLES for b in transcriber.buckets
        )
        self._task: Optional[asyncio.Task] = None
        self._running = False
        # set ONLY by the scheduler's crash handler: distinguishes a wedged-
        # device crash (alive=False, /health 'degraded') from a graceful
        # stop()/shutdown() (alive stays True — a cleanly stopped engine is
        # not a liveness failure)
        self._crashed = False
        # thread-truth tick occupancy: incremented/decremented by the
        # executor thread itself (_run_tick_guarded), so it stays correct
        # even when the event loop that dispatched a wedged tick is gone.
        # start() refuses to spawn a scheduler while a tick thread still
        # owns pool state; the lock serializes that check against the
        # thread's decrement + post-crash re-sweep.
        self._tick_lock = threading.Lock()
        self._tick_busy = 0
        # previous tick's unresolved device handles (pipelined scheduling)
        self._pending_results: Optional[dict] = None
        # overflow requests a full pool couldn't admit this tick
        self._ring_backlog: list[_RingTranscribeReq] = []
        self._host_backlog: list[_TranscribeReq] = []
        # True while any backlogged request routes to the SHORT pool (keeps
        # the long pool's pending-k exception honest, see _pick_k)
        self._backlog_has_short = False
        # fast-warmup replay thunks (compiled but not yet executed/linked on
        # device) draining in the scheduler's idle ticks — see warmup()
        self._replay_queue: deque = deque()
        self.stats = {"ticks": 0, "decode_steps": 0, "prefills": 0, "vad_batches": 0}
        # per-tick phase timeline (SONIC_TICK_TRACE=1): ring buffer of dicts,
        # read by tools/bench_interim.py to decompose scheduling latency
        self.tick_trace: "deque | None" = (
            deque(maxlen=4096)
            if _os.environ.get("SONIC_TICK_TRACE")
            else None
        )
        # per-tick admit decomposition (filled only while tracing): host
        # prep vs slot-state writes vs program dispatch, + groups per pool
        self._trace_admit: "dict | None" = None
        # decode-k caps: a mid-tick arrival waits for the in-flight program,
        # so these bound queueing latency (tuned on-chip; see bench history)
        self.pending_k_cap = 16
        self.live_k_cap = 32
        # long-pool cap while realtime streams are live (see _pick_k).
        # Tuned on chip: 8 halved the mixed-workload interim p95 (559->257 ms,
        # MIXED_BENCH.json); a 16 variant measured worse on every metric AT
        # 50 STREAMS (live <= long slots). Committed (speech-end -> final)
        # latency is dominated by slot-pool capacity vs synchronized final
        # waves, not by k — size `slots` to the expected concurrent finals.
        self.long_live_k_cap = 8
        # ...except when live streams OUTNUMBER long slots (the structural
        # oversubscription signal eager_ok already denies bets on) AND the
        # short class has measured slack (short_queue_ema under the eager
        # budget): final waves then queue behind each other for slots and
        # each resident final's k=8 residency multiplies the wave's
        # makespan — the knee sweep measured the 100-stream second window
        # collapsing run-dominated (long-run p50 10.7 s, queue p50 281 ms)
        # and k=16 restoring committed p50 11.0 -> 1.36 s with interim
        # p50/p95 UNCHANGED (SCALE_BENCH.json knee_100 vs remedy_k16_100).
        # The slack condition keeps the escalation out of the mixed-load
        # file-burst regime (50 streams on 32 slots is ALSO oversubscribed,
        # but there interims queue behind long programs and the k=8
        # granularity is what the MIXED_BENCH tuning bought).
        self.long_oversub_k_cap = 16
        # ...but when the short class is QUIET — no interim in flight AND
        # none admitted for short_quiet_s — the long pool may take a bigger
        # k and skip the pending cap (see _pick_k). Tuned on chip via
        # COMMIT_LATENCY_BENCH round 2: k32 beat k16 (committed p50 1236 vs
        # 1426 ms), k64 added nothing. The quiet-window guard exists for
        # the MIXED workload: with a file job running, momentary inter-wave
        # short-idle gaps otherwise let a 140 ms k32 program stall freshly
        # arriving interims (interim p95 249 -> 558 ms, MIXED_BENCH r3);
        # ongoing interim traffic means gaps stay under short_quiet_s, so
        # escalation fires only in true silence phases.
        self.long_idle_k_cap = 32
        self.short_quiet_s = 0.3
        self._last_short_admit = 0.0
        # max long-pool admissions per tick while the short class is busy
        # (admission pacing: bounds the host-prep + prefill work a file
        # burst can inject into one tick; see _admit_backlogs)
        self.busy_long_admit_cap = 2
        # mixed-load rationing: dispatch short-class admits + decode ahead
        # of long-class admits in each tick. Default OFF: the same-process
        # A/B (MIXED_BENCH.json r4) measured it a net loss — interim p50
        # 310 vs 254 ms and file RTF 0.057 vs 0.041 against the combined-
        # admit order, for a marginal p95 gain (575 vs 646). The deferral
        # splits admission into two host-prep passes per tick and the
        # starved-pool early-resolve spends a blocking RTT mid-tick.
        self.ration_long_admits = False
        # fuse the per-admit-group budget+draft writes (4 eager dispatches)
        # into one device program (_slot_write_program); behavior-identical
        # (token-parity tested incl. hotwords/drafts/waves). Default ON:
        # the same-process MIXED_BENCH r5 A/B measured the eager writes as
        # a dominant hidden tick cost — admit write time 14-23 ms/tick ->
        # 1.8 ms, 50-stream interim p50 276.1 -> 167.1 ms, p95 650 -> 426,
        # committed p50 1512 -> 1214 (epoch rtt 28.1 ms)
        self.fuse_slot_writes = True
        # de-synchronize lockstep interim cohorts with a per-stream cadence
        # phase (see interim_stagger; bench_scale A/Bs this flag)
        self.stagger_interims = True
        # file pipeline may run this many segment decodes concurrently
        self.concurrency_hint = slots
        # while the short (interim) class is ACTIVE, a LONG-pool prefill
        # group may not exceed this many total mel frames: a B=8 group at
        # the 512-frame bucket is a ~4096-frame encoder program that stalls
        # every interim queued behind it (MIXED_BENCH r3: interim p95 249 ->
        # 558 ms when a concurrent file job's segments grouped mid-speech).
        # During short-quiet phases (true silence, or no streams at all)
        # groups are throughput-sized — synchronized final waves still
        # group at B=8 because the gate's 1.28 s end-hangover guarantees
        # the quiet window by the time they arrive. Short-pool (interim)
        # groups are exempt: their waves self-batch and recur at a 1 s
        # cadence, not mid-wave.
        self.live_busy_prefill_frame_cap = 512
        self.quiet_prefill_frame_cap = 2048  # B=4 at the 512-frame bucket

        # ---- serialized-executable store (engine/exec_store.py) ----
        # Restart warmup: dispatch routes through stored jax.stages.Compiled
        # executables instead of the jit wrappers, so a restart deserializes
        # binaries instead of re-tracing/lowering the whole grid. Disabled
        # under a mesh (sharded-executable serialization is not exercised
        # by our tests; the dryrun/mesh path keeps the plain jit dispatch).
        from sonicscribe_tpu.engine.exec_store import ExecRouter

        store = None
        env = _os.environ.get("SONIC_EXEC_CACHE", "")
        if env != "0" and mesh is None:
            try:
                from sonicscribe_tpu.engine.exec_store import (
                    ExecStore,
                    params_signature,
                )

                context = (
                    repr(self.cfg),
                    params_signature(transcriber.params),
                    params_signature(getattr(vad, "params", None))
                    if getattr(vad, "params", None) is not None
                    else type(vad).__name__,
                    tuple(transcriber.buckets),
                    self.suffix_buckets,
                    self.prefill_batch_choices,
                    self.dual_k_choices,
                    tuple(self.chunk_buckets),
                    (self.S, self.N_STREAMS, self.MAX_NEW, self.short_budget),
                    (self.short.max_len, self.long.max_len,
                     self.short.trash_slot, self.long.trash_slot,
                     str(self.short.cache_k.dtype)),
                    tuple(self.ring.shape),
                    (self.use_flash, self.fuse_dual,
                     self._mel_dtype().__name__),
                )
                base = env or _os.path.join(
                    _os.path.expanduser("~"), ".cache", "sonicscribe_exec"
                )
                store = ExecStore(base, context)
            except Exception as e:  # pragma: no cover - defensive
                logger.warning("exec store disabled: %s", e)
        self._router = ExecRouter(store)

    # ---- compatibility views (tests/benches introspect the long pool) ----

    @property
    def cache_k(self):
        return self.long.cache_k

    @property
    def out_tokens(self):
        return self.long.out_tokens

    @property
    def MAX_LEN(self) -> int:
        return self.long.max_len

    @property
    def alive(self) -> bool:
        """False once the scheduler has CRASHED (e.g. the tick-stall abort
        on a wedged device runtime) — /health surfaces this as 'degraded'
        so a supervisor's liveness probe can trigger the restart that is
        the actual remedy. True before first start (lazy start is healthy)
        and after a graceful stop()/shutdown(): a clean stop is not a
        liveness failure and must not look like a wedged device."""
        return not self._crashed

    # ---------------- public async interface ----------------

    async def start(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is not None and self._task.done():
            # previous scheduler exited on THIS loop (crash: the tick-stall
            # abort, or any scheduler exception) — a finished task can't
            # serve the queue, and without this a post-crash transcribe()
            # would enqueue against nobody and hang. _fail_pending already
            # freed every slot/backlog/queued/future in the scheduler's
            # finally, so host state is clean; spawn a fresh scheduler (if
            # the device runtime is still wedged it will crash again,
            # bounded by the same tick-stall abort — the supervisor
            # process restart stays the durable remedy).
            self._task = None
        if self._task is not None and getattr(self, "_loop", None) is not loop:
            # event loop changed (tests / restart): rebind queues and task
            try:
                self._task.cancel()
            except RuntimeError:
                pass  # previous loop already closed
            self._task = None
        if self._task is None:
            with self._tick_lock:
                if self._tick_busy:
                    # a wedged tick's thread is STILL stuck in the device
                    # runtime and still owns pool state — a new scheduler
                    # would race it. Fail fast and loud: the caller sees a
                    # crashed-engine error, the supervisor restarts the
                    # process (the only remedy for a persistent wedge).
                    # Guarded on EVERY spawn path (post-crash, post-
                    # shutdown, loop rebind) under the same lock the tick
                    # thread holds while finishing, so the check cannot
                    # race the thread's own teardown.
                    raise RuntimeError(
                        "batcher crashed and the wedged device tick is "
                        "still stuck; restart the process"
                    )
                # a successful restart clears the crash flag: alive/_health
                # must report the NEW scheduler's state, not the old one's
                # epitaph (a liveness probe keyed to 'degraded' would
                # otherwise restart-loop a healthy process forever)
                self._crashed = False
            self._loop = loop
            self._requests = asyncio.Queue()
            self._vad_requests = asyncio.Queue()
            self._wake = asyncio.Event()
            self._pending_results = None  # stale handles die with the old loop
            self._running = True
            self._task = asyncio.ensure_future(self._scheduler())

    async def transcribe(
        self,
        audio: np.ndarray,
        sample_rate: int,
        max_new_tokens: int,
        hotwords: Optional[list[str]] = None,
        draft_tokens=None,
        speculative: bool = False,
    ) -> TranscribeResult:
        await self.start()
        fut = asyncio.get_running_loop().create_future()
        await self._requests.put(
            _TranscribeReq(
                np.asarray(audio, np.float32),
                sample_rate,
                min(max_new_tokens, self.MAX_NEW),
                hotwords,
                fut,
                time.perf_counter(),
                draft_tokens=draft_tokens,
                speculative=speculative,
            )
        )
        self._wake.set()
        return await fut

    async def vad_window_prob(self, audio: np.ndarray, state):
        await self.start()
        fut = asyncio.get_running_loop().create_future()
        await self._vad_requests.put(_VadReq(np.asarray(audio, np.float32), state, fut))
        self._wake.set()
        return await fut

    # ---------------- device audio-ring interface (realtime streams) ----

    def alloc_stream(self) -> Optional[int]:
        """Claim a ring stream row; None if the server is at capacity."""
        if not self._free_streams:
            return None
        idx = self._free_streams.pop()
        # reset the stream's device VAD state row
        init_row = self.vad.init_state(1)
        self.vad_states = jax.tree.map(
            lambda full, row: full.at[idx : idx + 1].set(row),
            self.vad_states,
            init_row,
        )
        return idx

    def free_stream(self, idx: int) -> None:
        if idx is not None and idx not in self._free_streams:
            self._free_streams.append(idx)

    def interim_stagger(self, stream_idx: Optional[int]) -> float:
        """Per-stream interim-cadence phase offset in seconds, consumed by
        serve/session at each speech start. Lockstep cohorts (sessions whose
        utterances start together) otherwise admit every interim wave as ONE
        burst that oversubscribes the short pool (SCALE_BENCH 100-stream p50
        floated 265-334 ms); spreading the cohort over eight 125 ms phases
        within the same >= 1 s cadence de-synchronizes the waves. Returns
        0.0 — no UX cost — unless live streams could fill half the short
        pool in one wave.

        Deliberately keyed to the INSTANTANEOUS live count, re-read at each
        speech start (not latched per stream at alloc time): a latch would
        freeze the early-allocated half of a growing cohort at phase 0 —
        exactly the streams that later need spreading. The cost is that a
        stream's phase can flip between utterances as the cohort crosses
        the half-pool threshold; within one utterance the phase is fixed
        (session reads it once per speech start)."""
        if not self.stagger_interims:
            return 0.0
        live = self.N_STREAMS - len(self._free_streams)
        if stream_idx is None or live * 2 < len(self.short.slots):
            return 0.0
        return (stream_idx % 8) / 8.0

    def ingest(self, stream_idx: int, chunk_id: int, pcm: bytes) -> None:
        """Queue one 64 ms int16 chunk for the next packed upload. Sync, no
        device interaction — the scheduler ships ALL sessions' chunks in one
        transfer per tick."""
        arr = np.frombuffer(pcm[: 2048], dtype="<i2")
        if arr.shape[0] < 1024:
            arr = np.pad(arr, (0, 1024 - arr.shape[0]))
        self._ingest_pending.append((stream_idx, chunk_id, arr))
        try:
            self._wake.set()
        except RuntimeError:
            # _wake still bound to a closed loop (restart/tests); the next
            # awaited engine call rebinds and the scheduler drains the list
            pass

    async def vad_window_ring(self, stream_idx: int, start_chunk: int) -> float:
        """Gate probability for the 10-chunk window starting at start_chunk,
        sliced on device; state is device-resident per stream."""
        await self.start()
        fut = asyncio.get_running_loop().create_future()
        await self._vad_ring_requests.put(_VadRingReq(stream_idx, start_chunk, fut))
        self._wake.set()
        return await fut

    async def transcribe_ring(
        self,
        stream_idx: int,
        start_chunk: int,
        chunk_count: int,
        max_new_tokens: int,
        hotwords: Optional[list[str]] = None,
        duration_s: float = 0.0,
        draft_tokens=None,
        speculative: bool = False,
    ) -> TranscribeResult:
        """Transcribe ring chunks [start_chunk, start_chunk+chunk_count) —
        zero audio upload."""
        await self.start()
        fut = asyncio.get_running_loop().create_future()
        await self._ring_requests.put(
            _RingTranscribeReq(
                stream_idx,
                start_chunk,
                chunk_count,
                min(max_new_tokens, self.MAX_NEW),
                hotwords,
                duration_s or chunk_count * 1024 / 16000.0,
                fut,
                time.perf_counter(),
                draft_tokens=draft_tokens,
                speculative=speculative,
            )
        )
        self._wake.set()
        return await fut

    def shutdown(self) -> None:
        self._running = False
        self._replay_queue.clear()
        task, self._task = self._task, None
        if task is None or task.done():
            return
        try:
            loop = task.get_loop()
        except Exception:
            task.cancel()
            return
        if loop.is_closed():
            return
        # let the scheduler observe _running=False and exit cleanly; fall
        # back to cancel if the loop never runs again
        self._wake.set()
        if not loop.is_running():
            try:
                loop.run_until_complete(asyncio.wait_for(task, timeout=2.0))
            except Exception:
                task.cancel()
        else:
            loop.call_later(2.0, task.cancel)

    def warmup(
        self, budgets=(15, 200, 256), full: bool = False, fast: bool = False
    ) -> None:
        """Compile the prefill-program grid, the decode-k ladders, and the
        VAD/scatter programs for BOTH cache pools (callable before the event
        loop starts).

        Two passes. Pass 1 AOT-compiles the WHOLE grid in a thread pool via
        `jit_fn.lower(args).compile()` — measured on the tunnel TPU, compile
        latency is per-program round-trip-bound (~2-4 s each, even for the
        tiny model) and the remote compiler parallelizes across client
        threads ~5x, so the grid compiles in parallel wall time. With the
        serialized-executable store enabled (engine/exec_store.py, the
        default), pass 1 instead DESERIALIZES stored binaries on restart —
        no trace/lower/compile (measured on chip: 30.7 s -> ~15 s restart,
        BENCH r3 stream_warmup_phases). Pass 2
        replays the grid as real dispatches, which hit the persistent
        compilation cache (the handoff is disk-cache-keyed, so warmup
        enables a default cache dir if none is configured), and the warmup
        finishes with one real admit->decode->reap per pool so every small
        utility op is compiled too.

        Default grid: every batch size for the SMALLEST mel bucket (the
        high-rate interim path), a {1,4,8} group ladder for the long pool's
        default-suffix big buckets (synchronized final/file waves admit in
        groups — COMMIT_LATENCY_BENCH), and B=1 elsewhere; `full=True`
        compiles every (bucket, B) pair.

        `fast=True` = two-phase boot: only the truly CRITICAL subset
        blocks ready — pass-1 compiles/deserializations, the VAD/scatter
        replays, and the end-to-end exercise. Every other compiled
        program's replay (its server-side load/link + first run, 1-2 s
        each of remote-service latency — the 95.6 s restart tail of
        WARMUP_BENCH r3) goes to the idle-tick replay queue in
        dispatch-likelihood order; a request landing on a not-yet-linked
        program pays that one link lazily. The deferred programs
        (long-pool B>1 group prefills, rows decode variants, escalation
        k-rungs) AOT-compile on a background thread and register as they
        land — the scheduler is gated to registered programs, so until
        then finals admit as B=1 waves and decode full-pool.
        `warmup_join()` + `drain_replays()` bring the engine to full
        steady state (benches call both before measuring).
        """
        del budgets  # decode cost is per-k, not per-budget
        # the pass-1 -> pass-2 handoff rides the persistent compilation
        # cache; make sure one exists and that EVERY program persists (the
        # default 1 s min-compile-time filter drops exactly the many small
        # programs whose per-program round trips dominate restart warmup)
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(
                    _os.path.expanduser("~"), ".cache", "sonicscribe_xla"
                ),
            )
        try:
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:  # older jax spelling; non-fatal
            pass

        tr = self.transcriber
        prompt = build_prompt(tr.tokenizer, self.cfg)
        n_suffix = min(len(prompt.suffix_ids), MAX_SUFFIX_TOKENS)

        def suffix_arr(sb: int, B: int) -> np.ndarray:
            arr = np.full((B, sb), self.cfg.pad_id, np.int32)
            arr[:, : min(n_suffix, sb)] = prompt.suffix_ids[: min(n_suffix, sb)]
            return arr

        def grid_choices(
            pool, ring: bool, is_smallest: bool, sb: int, frame_bucket: int,
            pool_choices,
        ):
            """Batch sizes to compile for one (pool, path, bucket, sb) cell.
            Warmup wall time is per-program round-trip-bound on the tunnel,
            so the default grid compiles only what the serving workload
            dispatches; `full=True` compiles every pair."""
            if full:
                return pool_choices
            if pool is self.short:
                if ring and is_smallest:
                    # the interim hot path: full ladder
                    return pool_choices
                # host-audio short prefills serve only ring-overflow
                # sessions' interims; a small ladder suffices
                return tuple(b for b in ((1, 4) if not ring else (1,))
                             if b in pool_choices) or (1,)
            if sb == self.suffix_buckets[0]:
                # synchronized final/file waves admit in GROUPS: B=1-only
                # prefill waves measured as the dominant committed-latency
                # term (COMMIT_LATENCY_BENCH) — group ladder for the
                # default-suffix long class at every bucket, including the
                # largest live-busy-safe group so big buckets aren't forced
                # back to B=1 while interims are active
                live_cap = max(
                    1, self.live_busy_prefill_frame_cap // max(frame_bucket, 1)
                )
                return tuple(
                    b for b in (1, 2, 4, 8)
                    if b in pool_choices and (b <= live_cap or b in (4, 8))
                ) or (1,)
            return (1,)  # hotword-suffix finals are rare; B=1 only

        n_sub = 10240 // WINDOW_SAMPLES  # 640 ms gate window
        if self._vad_program is None or self._vad_n_sub != n_sub:
            self._vad_program = _make_vad_batch_program(self.vad, n_sub)
            self._vad_n_sub = n_sub
        from sonicscribe_tpu.engine.ring import (
            _SCATTER_BUCKETS,
            scatter_chunks_program,
        )

        dtype = self.long.cache_k.dtype
        smallest = min(tr.buckets)
        smallest_cb = min(self.chunk_buckets)

        def pass_over_grid(run) -> None:
            """One full iteration of the program grid; `run(thunk,
            deferred=...)` either executes it inline (dispatch pass) or
            submits it to the compile pool (AOT pass, where each thunk only
            lowers+compiles). `deferred=True` marks programs serving can
            start WITHOUT (fast warmup compiles them in the background and
            the scheduler is gated to registered programs): long-pool B>1
            prefill groups (admission falls back to B=1 waves) and the
            occupied-prefix decode rows variants (falls back to full-pool
            decode).

            `prio` orders the fast-boot replay queue (0 = first): the
            scheduler's idle ticks pay each program's server-side
            load/link in the order serving is likely to dispatch them —
            interim ring prefills, then the short decode ladder, then
            long-pool B=1 prefills + live-cap decode, then the rest.
            `critical=True` (VAD/scatter — every tick with streams needs
            them) replays inline even in fast mode."""
            for pool in self.pools:
                pool_choices = tuple(
                    b for b in self.prefill_batch_choices
                    if b <= max(1, len(pool.slots))
                )
                for bucket in tr.buckets:
                    for sb in self.suffix_buckets:
                        if (
                            pool is self.short
                            and self._pool_for(bucket, 1, sb) is not pool
                        ):
                            continue  # short pool hosts only feasible combos
                        for B in grid_choices(
                            pool, False, bucket == smallest, sb, bucket,
                            pool_choices,
                        ):
                            def host_prefill(pool=pool, bucket=bucket, sb=sb, B=B, lower_only=False):
                                mels = jnp.zeros(
                                    (B, bucket, tr.mel_cfg.n_mels), dtype
                                )
                                self._dispatch_prefill_group(
                                    pool, mels,
                                    np.full((B,), bucket, np.int32),
                                    np.asarray(prompt.prefix_ids),
                                    suffix_arr(sb, B),
                                    np.full((B,), min(n_suffix, sb), np.int32),
                                    [pool.trash_slot] * B,
                                    lower_only=lower_only,
                                )
                                pool.compiled_prefill.add((bucket, sb, B))

                            # host-audio SHORT prefills serve only ring-
                            # overflow sessions' interims: B=1 suffices at
                            # ready (admission splits to compiled sizes)
                            run(host_prefill,
                                deferred=B > 1,
                                replay_bg=pool is self.long,
                                prio=2 if (
                                    pool is self.short
                                    or (B == 1 and sb == self.suffix_buckets[0])
                                ) else 3)
                if self.fuse_slot_writes:
                    # fused admit-state writes: one trivial program per
                    # (pool, B) — compiled non-deferred (negligible vs the
                    # prefill/decode grid) so the fused path never JITs
                    # mid-serving; _set_slot_state falls back to the eager
                    # writes for any key not yet linked (r5 review)
                    for B in pool_choices:
                        run(lambda pool=pool, B=B, lower_only=False:
                                self._warmup_slot_write(
                                    pool, B, lower_only=lower_only),
                            prio=2)
                # the short pool's budgets never exceed short_budget, so its
                # k ladder stops there — bigger programs would compile but
                # never dispatch (_pick_k picks smallest k >= min remaining)
                k_choices = (
                    self.dual_k_choices
                    if pool is self.short
                    else _DECODE_K_CHOICES
                )
                for k in k_choices:
                    # rows variants only for k >= 8: small-k programs run
                    # few steps, so the prefix saving can't repay the extra
                    # compiles, and _pick_rows returns full for them
                    row_opts = (None,) + tuple(
                        r for r in pool.rows_ladder if k >= 8
                    )
                    for rows in row_opts:
                        # long-pool k>live-cap rungs are escalation
                        # programs (quiet windows / no-live-stream file
                        # bursts / the oversubscribed k=16 cap): serving
                        # starts without them — _pick_k
                        # clamps to registered rungs — so fast boot defers
                        # their big scan compiles (the blocking pass's long
                        # pole, WARMUP_BENCH fast.aot_parallel) to the
                        # background thread, then idle ticks pay the link.
                        run(lambda pool=pool, k=k, rows=rows, lower_only=False:
                            self._dispatch_decode(
                                pool, k, lower_only=lower_only, rows=rows),
                            deferred=rows is not None
                            or (pool is self.long and k > self.long_live_k_cap),
                            replay_bg=pool is self.long and k >= 16,
                            prio=1 if pool is self.short else (
                                # k<=16 full-rows are live serving rungs
                                # (8 = live cap, 16 = oversubscribed cap) —
                                # background-compile them ahead of the
                                # idle-escalation/rows variants
                                2 if rows is None
                                and k <= self.long_oversub_k_cap
                                else 3))
                if self.speculative and pool is not self.short:
                    # speculative verify grid (all deferred: until
                    # registered, drafted requests fall back to k-step
                    # decode). LONG pool only: drafts reach the short pool
                    # only via speculative_interims, which cannot fire with
                    # the reference constants (the sliding last-20-chunk
                    # window never repeats a start between 1 s-cadence
                    # interims — measured verify_rounds=0, INTERIM_BENCH);
                    # final decodes (the drafts that DO fire) have >=50
                    # token budgets and always route long. A drafted short
                    # request post-warmup degrades losslessly to the plain
                    # k ladder (_pick_verify_rounds returns None).
                    r_cap = self.verify_rounds_choices[-1]
                    for r in self.verify_rounds_choices:
                        if r > r_cap:
                            continue
                        for rows in (None,) + tuple(
                            rw for rw in pool.rows_ladder if rw in (1, 4)
                        ):
                            run(lambda pool=pool, r=r, rows=rows,
                                lower_only=False:
                                self._dispatch_verify(
                                    pool, r, lower_only=lower_only,
                                    rows=rows),
                                deferred=True, prio=3)
                for cb in self.chunk_buckets:
                    fb = cb * 1024 // 160  # frame bucket for this chunk bucket
                    for sb in self.suffix_buckets:
                        if (
                            pool is self.short
                            and self._pool_for(fb, 1, sb) is not pool
                        ):
                            continue
                        for B in grid_choices(
                            pool, True, cb == smallest_cb, sb, fb,
                            pool_choices,
                        ):
                            def ring_prefill(pool=pool, cb=cb, sb=sb, B=B, lower_only=False):
                                self._dispatch_ring_prefill(
                                    pool,
                                    np.full((B,), self.trash_stream, np.int32),
                                    np.zeros((B,), np.int32),
                                    np.ones((B,), np.int32),
                                    prompt.prefix_ids,
                                    [pool.trash_slot] * B,
                                    suffix_arr(sb, B),
                                    np.full((B,), min(n_suffix, sb), np.int32),
                                    cb,
                                    lower_only=lower_only,
                                )
                                pool.compiled_ring_prefill.add((cb, sb, B))

                            # a lockstep 50-stream interim wave admits as
                            # B<=8 chunks (extra ~30-60 ms/wave) until the
                            # background pass registers the 16/32 rungs —
                            # cheaper than blocking cold boot on their
                            # compiles
                            run(ring_prefill,
                                deferred=(pool is self.long and B > 1)
                                or (pool is self.short and B > 8),
                                replay_bg=pool is self.long and cb != smallest_cb,
                                prio=0 if (pool is self.short and cb == smallest_cb)
                                else 1 if pool is self.short
                                else 2 if B == 1 else 3)
            if self.fuse_dual:
                for k in self.dual_k_choices:
                    run(lambda k=k, lower_only=False:
                        self._dispatch_decode_dual(k, lower_only=lower_only),
                        prio=1)
            # VAD / scatter programs compile per batch bucket; their jitted
            # fns are pure (no engine-state mutation needed for warmup), so
            # the dispatch pass may discard results
            # VAD/scatter: every tick with streams needs the bucket matching
            # its batch — but only the LARGE buckets are needed at boot (a
            # lockstep N-stream cohort's first gate wave and first ingest
            # tick land in the top buckets; the small ones serve shrinking
            # cohorts later and link lazily at ~1-2 s once if a request
            # beats the idle-tick replay queue). r4's fast-cold replayed all
            # 12 inline and dispatch_replay was 184.9 s of the 226.6 s cold
            # boot (WARMUP_BENCH) — the r5 cut: small buckets queue at the
            # head (prio 0), criticals replay in PARALLEL (see below).
            for B in _VAD_BATCH_BUCKETS:
                def vad_host(B=B, lower_only=False):
                    self._run_vad_host(
                        jnp.zeros((B, n_sub, WINDOW_SAMPLES), jnp.float32),
                        self.vad.init_state(B),
                        lower_only=lower_only,
                    )

                run(vad_host, critical=B >= 16, prio=0)

                def vad_ring(B=B, lower_only=False):
                    self._run_vad_ring(
                        jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                        jnp.zeros((B,), bool),
                        lower_only=lower_only,
                    )

                run(vad_ring, critical=B >= 16, prio=0)
            for M in _SCATTER_BUCKETS:
                def scatter(M=M, lower_only=False):
                    self._run_scatter(
                        jnp.zeros((M, 1024), jnp.int16),
                        jnp.full((M,), self.trash_stream, jnp.int32),
                        jnp.zeros((M,), jnp.int32),
                        lower_only=lower_only,
                    )

                # exclusive: the scatter program DONATES self.ring and
                # rebinds it — two concurrent replays would hand the same
                # buffer to two programs (observed: "Array has been
                # deleted" on the second), so these never enter the
                # parallel critical pool
                run(scatter, critical=M >= 128, prio=0, exclusive=True)

        phase_s: dict[str, float] = {}
        t0 = time.perf_counter()

        # ---- pass 1: AOT-compile the whole grid in parallel ----
        from concurrent.futures import ThreadPoolExecutor

        n_jobs = 0
        errors: list[Exception] = []
        deferred_thunks: list = []
        with ThreadPoolExecutor(max_workers=16) as ex:
            futures = []

            def submit(thunk, deferred=False, replay_bg=False,
                       critical=False, prio=3, exclusive=False):
                nonlocal n_jobs
                if fast and deferred:
                    # keep the replay marker: execution-heavy programs get
                    # their link paid by an idle-tick replay after the
                    # background compile lands, not by the first request
                    deferred_thunks.append((thunk, replay_bg))
                    return
                n_jobs += 1
                futures.append(ex.submit(thunk, lower_only=True))

            pass_over_grid(submit)
            for f in futures:
                try:
                    f.result()
                except Exception as e:  # pragma: no cover - surface in pass 2
                    errors.append(e)
        if errors:
            # pass 2 recompiles serially and raises with full context
            logger.warning(
                "%d/%d warmup AOT compiles failed (first: %s); "
                "falling back to serial compile for those programs",
                len(errors), n_jobs, errors[0],
            )
        phase_s["aot_parallel"] = round(time.perf_counter() - t0, 1)
        t1 = time.perf_counter()

        # ---- pass 2: replay as real dispatches (persistent-cache hits) ----
        slowest: list[tuple[float, str]] = []

        # SONIC_WARMUP_SYNC=1: drain the device queue after every program so
        # warmup_slowest attributes true per-program cost (diagnostics only;
        # dispatches are async on the tunnel backend, so by default the cost
        # pools up in the final drain)
        per_thunk_sync = bool(_os.environ.get("SONIC_WARMUP_SYNC"))

        queued: list[tuple[int, int, object]] = []
        crit_thunks: list = []

        def replay(thunk, deferred=False, replay_bg=False,
                   critical=False, prio=3, exclusive=False):
            del replay_bg  # subsumed: every non-critical fast replay queues
            if fast and deferred:
                return  # background-compiled; first dispatch is its replay
            if fast and critical:
                # critical replays run AFTER the grid pass from a small
                # thread pool: each one's server-side load/link is a 1-15 s
                # remote-service round trip (cold), independent across
                # programs — serial inline replay made this 184.9 s of the
                # 226.6 s r4 fast-cold boot (WARMUP_BENCH). Donating
                # (exclusive) programs run serially after the pool.
                crit_thunks.append((thunk, exclusive))
                return
            if fast and not critical:
                # compiled (pass 1 / exec store) but its server-side
                # load/link has not run. r3 replayed most of these INLINE,
                # which made dispatch_replay the whole restart cost (95.6 s
                # of a 99 s restart, WARMUP_BENCH — the per-program link is
                # 1-2 s of remote-service latency, serialized). Serving
                # needs none of them to START: the e2e exercise below links
                # the first-dispatch path, and the scheduler's idle ticks
                # drain this queue in dispatch-likelihood order (prio),
                # interleaved with traffic — a request landing on a
                # not-yet-linked program pays its own link once, which the
                # drop-and-recompile safety net already covers for stale
                # store entries.
                queued.append((prio, len(queued), thunk))
                return
            t = time.perf_counter()
            thunk()
            if per_thunk_sync:
                np.asarray(self.long.cache_len[:1])
            dt = time.perf_counter() - t
            slowest.append((round(dt, 2), getattr(thunk, "__name__", "?")))

        # The replay pass stays even when every program deserialized from
        # the exec store: on the tunnel backend a loaded executable's
        # server-side load/link is deferred to its first execution, and
        # replay is also what surfaces a stale store entry before serving
        # traffic. In fast mode only the VAD/scatter programs (needed by
        # every tick) replay inline; the rest drain through the idle-tick
        # queue so `ready` is not blocked on 75 serialized link round trips.
        pass_over_grid(replay)
        if crit_thunks:
            pooled = [t for t, excl in crit_thunks if not excl]
            serial = [t for t, excl in crit_thunks if excl]
            if pooled:
                with ThreadPoolExecutor(max_workers=8) as ex2:
                    for _ in ex2.map(lambda t: t(), pooled):
                        pass
            for t in serial:
                t()
        np.asarray(self.long.cache_len[:1])  # drain the dispatch queue
        self.stats["warmup_slowest"] = sorted(slowest, reverse=True)[:8]
        queued.sort(key=lambda q: (q[0], q[1]))
        self._replay_queue.extend(t for _, _, t in queued)
        if self._replay_queue:
            self.stats["warmup_replay_pending"] = len(self._replay_queue)
        phase_s["dispatch_replay"] = round(time.perf_counter() - t1, 1)
        t2 = time.perf_counter()

        # ---- END-TO-END EXERCISE per pool: one real admit->decode->reap so
        # every small utility op (bias row writes, status math, token fetch)
        # is compiled too — on the remote AOT compiler even trivial
        # first-use programs cost seconds, which would otherwise hit the
        # first session.
        for pool in self.pools:
            base_row = (
                jnp.zeros_like(pool.bias[0])
                if self._base_bias is None
                else self._base_bias
            )
            pool.bias = pool.bias.at[0].set(base_row)
            pool.budgets = pool.budgets.at[0].set(3)
            self._dispatch_ring_prefill(
                pool,
                np.full((1,), self.trash_stream, np.int32),
                np.zeros((1,), np.int32),
                np.ones((1,), np.int32),
                prompt.prefix_ids,
                [0],  # slot 0
                suffix_arr(self.suffix_buckets[0], 1),
                np.full((1,), min(n_suffix, self.suffix_buckets[0]), np.int32),
                smallest_cb,
            )
            status = np.asarray(self._dispatch_decode(pool, 4))
            _ = np.asarray(pool.out_tokens)  # the reap fetch
            del status
            # reset slot state touched by warmup
            pool.cache_len = jnp.zeros_like(pool.cache_len)
            pool.n_emitted = jnp.zeros_like(pool.n_emitted)
            pool.done = jnp.ones_like(pool.done)
            pool.budgets = jnp.zeros_like(pool.budgets)
        # IMPORTANT: on the remote-tunnel TPU, block_until_ready does NOT
        # wait (ops/compiles queue server-side; only transfers synchronize).
        # A real transfer of the last dispatched op drains the queue.
        np.asarray(self.long.cache_len)
        phase_s["e2e_exercise"] = round(time.perf_counter() - t2, 1)
        self.stats["warmup_phase_s"] = phase_s
        self.stats["warmup_programs"] = n_jobs
        self._warmed = True

        # ---- fast mode: background AOT of the deferred programs ----
        if deferred_thunks:
            import threading

            self.stats["warmup_background_pending"] = len(deferred_thunks)

            def _bg() -> None:
                # 4 threads: enough remote-compiler parallelism to finish in
                # a couple of waves without starving live serving dispatches
                # of tunnel bandwidth. lower_only never touches engine
                # state, so this is safe alongside the scheduler; each thunk
                # registers its program in the compiled_* set when done and
                # the scheduler starts using it on the next tick.
                with ThreadPoolExecutor(max_workers=4) as bex:
                    futs = [
                        bex.submit(t, lower_only=True)
                        for t, _ in deferred_thunks
                    ]
                    done = 0
                    for f, (t, wants_replay) in zip(futs, deferred_thunks):
                        try:
                            f.result()
                            if wants_replay:
                                # idle ticks pay the server-side link so the
                                # first real dispatch doesn't (deque.append
                                # is GIL-atomic; the scheduler pops on the
                                # loop thread)
                                self._replay_queue.append(t)
                        except Exception as e:  # pragma: no cover
                            logger.warning("background warmup compile: %s", e)
                        done += 1
                        self.stats["warmup_background_pending"] = (
                            len(deferred_thunks) - done
                        )

            self._bg_warmup = threading.Thread(
                target=_bg, name="warmup-bg", daemon=True
            )
            self._bg_warmup.start()

    def warmup_join(self, timeout: float | None = None) -> None:
        """Block until fast-mode background warmup finishes (no-op
        otherwise); benches call this before steady-state measurement."""
        t = getattr(self, "_bg_warmup", None)
        if t is not None:
            t.join(timeout)

    def drain_replays(self, timeout: float | None = None) -> float:
        """Synchronously execute every queued warmup replay (server-side
        link + first run). For benches: call after ``warmup_join()`` and
        BEFORE offering traffic so measured windows read steady state.
        Production never calls this — the scheduler's idle ticks drain the
        queue interleaved with live traffic. Returns seconds spent."""
        t0 = time.perf_counter()
        while True:
            if timeout is not None and time.perf_counter() - t0 > timeout:
                break
            try:
                # single atomic popleft: a check-then-pop pattern races the
                # scheduler's idle-tick drain when called on a started
                # engine (both consume this deque)
                thunk = self._replay_queue.popleft()
            except IndexError:
                break
            self._run_replay_thunk(thunk)
        np.asarray(self.long.cache_len[:1])  # drain the dispatch queue
        self.stats["warmup_replay_pending"] = len(self._replay_queue)
        return time.perf_counter() - t0

    # ---------------- device dispatch helpers ----------------

    def _suffix_bucket(self, n_suffix: int) -> int:
        for sb in self.suffix_buckets:
            if n_suffix <= sb:
                return sb
        return self.suffix_buckets[-1]

    def _prompt_len(self, frame_bucket: int, suffix_bucket: int | None = None) -> int:
        return (
            3
            + frame_bucket // self.cfg.frames_per_audio_token
            + (self.suffix_buckets[0] if suffix_bucket is None else suffix_bucket)
        )

    def _pool_for(
        self, frame_bucket: int, budget: int, suffix_bucket: int | None = None
    ) -> _CachePool:
        """Route a request to the smallest pool whose cache fits its prompt
        buffer + decode budget."""
        need = self._prompt_len(frame_bucket, suffix_bucket) + budget
        if need <= self.short.max_len and self.short.slots:
            return self.short
        return self.long

    def _route_suffix_bucket(self, hotwords) -> int:
        """Suffix bucket for a request (prompt construction is cached)."""
        prompt = build_prompt(
            self.transcriber.tokenizer, self.cfg, hotwords=hotwords
        )
        return self._suffix_bucket(
            min(len(prompt.suffix_ids), MAX_SUFFIX_TOKENS)
        )

    def _req_suffix_bucket(self, req) -> int:
        """Per-request memo of _route_suffix_bucket: the backlog paths
        re-route every queued request every tick, and build_prompt's global
        cache clears wholesale at 4096 entries — under adversarial hotword
        churn that would re-tokenize the whole backlog each tick (ADVICE
        r2 weak #6). The routed bucket is immutable per request."""
        sb = getattr(req, "_suffix_bucket_memo", None)
        if sb is None:
            sb = self._route_suffix_bucket(req.hotwords)
            req._suffix_bucket_memo = sb
        return sb

    def _mel_dtype(self):
        return (
            jnp.bfloat16
            if jax.tree.leaves(self.transcriber.params)[0].dtype == jnp.bfloat16
            else jnp.float32
        )

    # exec-store views (tests and debugging introspect these)
    @property
    def _exec_store(self):
        return self._router.store

    @property
    def _execs(self) -> dict:
        return self._router.execs

    def _run_program(
        self, key, jit_fn, lower_args, dyn_args, kwargs=None,
        lower_only=False, donate_idx=(),
    ):
        """Dispatch one grid program through the serialized-executable
        router (see exec_store.ExecRouter for the full contract —
        Compiled-object dispatch, donated-arg validation copies, stale-
        load recompile fallback)."""
        return self._router.run(
            key, jit_fn, lower_args, dyn_args, kwargs,
            lower_only=lower_only, donate_idx=donate_idx,
        )

    def _run_vad_host(self, windows, states, lower_only=False):
        """Batched host-audio VAD program (exec-store routed)."""
        a = (self.vad.params, windows, states)
        key = (
            "vad_host", type(self.vad).__name__,
            int(windows.shape[0]), int(windows.shape[1]),
        )
        return self._run_program(
            key, self._vad_program, a, a, lower_only=lower_only
        )

    def _run_vad_ring(self, stream_idx, start, active, lower_only=False):
        """Batched ring-VAD program (exec-store routed); returns
        (probs, new_states) — callers decide whether to keep the states
        (warmup discards them; the program does not donate)."""
        a = (
            self.ring, self.vad.params, self.vad_states,
            stream_idx, start, active,
        )
        key = (
            "vad_ring", type(self.vad).__name__, int(stream_idx.shape[0]),
        )
        return self._run_program(
            key, self._vad_ring_program, a, a, lower_only=lower_only
        )

    def _run_scatter(self, packed, stream_idx, chunk_ids, lower_only=False):
        """Ring scatter program (exec-store routed). Donates and replaces
        self.ring."""
        from sonicscribe_tpu.engine.ring import scatter_chunks_program

        a = (self.ring, packed, stream_idx, chunk_ids)
        key = ("scatter", int(packed.shape[0]))
        out = self._run_program(
            key, scatter_chunks_program, a, a, lower_only=lower_only,
            donate_idx=(0,),
        )
        if not lower_only:
            self.ring = out

    def _dispatch_prefill_group(
        self, pool: _CachePool, mels, frames, prefix, suffixes, suffix_lens,
        slot_list, lower_only: bool = False,
    ):
        args = (
            self.transcriber.params,
            self.cfg,
            mels,
            jnp.asarray(frames, jnp.int32),
            jnp.asarray(prefix),
            jnp.asarray(suffixes),
            jnp.asarray(suffix_lens, jnp.int32),
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
            pool.bias,
            pool.budgets,
            jnp.asarray(slot_list, jnp.int32),
        )
        key = (
            "prefill", pool.name, int(mels.shape[1]), int(mels.shape[0]),
            int(args[5].shape[1]), int(args[4].shape[0]),
        )
        out = self._run_program(
            key, _prefill_slots_program, args, args[:1] + args[2:],
            lower_only=lower_only, donate_idx=(6, 7, 8, 9, 11, 12),
        )
        if lower_only:
            return
        (
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
        ) = out

    def _dispatch_ring_prefill(
        self, pool: _CachePool, stream_idx, start, count, prefix, slot_list,
        suffixes, suffix_lens, n_chunks: int, lower_only: bool = False,
    ):
        tr = self.transcriber
        args = (
            tr.params,
            self.cfg,
            tr.mel_cfg,
            self.ring,
            jnp.asarray(stream_idx, jnp.int32),
            jnp.asarray(start, jnp.int32),
            jnp.asarray(count, jnp.int32),
            jnp.asarray(prefix),
            pool.cache_k, pool.cache_v, pool.cache_len, pool.last_tok,
            pool.out_tokens, pool.n_emitted, pool.done,
            pool.bias, pool.budgets,
            jnp.asarray(slot_list, jnp.int32),
            jnp.asarray(suffixes),
            jnp.asarray(suffix_lens, jnp.int32),
        )
        kwargs = dict(n_chunks=n_chunks, mel_dtype=self._mel_dtype())
        key = (
            "ring_prefill", pool.name, n_chunks, int(args[4].shape[0]),
            int(args[18].shape[1]), int(args[7].shape[0]),
        )
        out = self._run_program(
            key, _prefill_ring_program, args, args[:1] + args[3:], kwargs,
            lower_only=lower_only, donate_idx=(6, 7, 8, 9, 11, 12),
        )
        if lower_only:
            return
        (
            pool.cache_k, pool.cache_v, pool.cache_len, pool.last_tok,
            pool.out_tokens, pool.n_emitted, pool.done,
        ) = out

    def _pick_rows(self, pool: _CachePool, k: int) -> int | None:
        """Smallest compiled rows covering every active slot (occupied-
        prefix decode, rows_ladder); None = the full pool. Only rungs whose
        (k, rung) program is registered compiled are eligible (rows
        variants compile for k >= 8 and may arrive late via background
        warmup)."""
        if not pool.rows_ladder:
            return None
        high = 0
        for i, s in enumerate(pool.slots):
            if s.active:
                high = i + 1
        for r in pool.rows_ladder:
            if r >= high and (k, r) in pool.compiled_decode:
                return r
        return None

    def _dispatch_decode(
        self, pool: _CachePool, k: int, lower_only: bool = False,
        rows: int | None = None,
    ):
        args = (
            self.transcriber.params,
            self.cfg,
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
            pool.bias,
            pool.budgets,
            k,
            self.use_flash,
        )
        key = ("decode", pool.name, k, self.use_flash, rows)
        out = self._run_program(
            key, _decode_k_program, args, args[:1] + args[2:11],
            kwargs={"rows": rows},
            lower_only=lower_only, donate_idx=(1, 2, 3, 4, 6, 7),
        )
        pool.compiled_decode.add((k, rows))
        if lower_only:
            return None
        (
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
            status,
        ) = out
        return status

    def _dispatch_verify(
        self, pool: _CachePool, n_rounds: int, lower_only: bool = False,
        rows: int | None = None,
    ):
        """Speculative verify rounds (see _verify_rounds_program). Same
        parked-status contract as _dispatch_decode."""
        args = (
            self.transcriber.params,
            self.cfg,
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
            pool.bias,
            pool.budgets,
            pool.draft,
            pool.draft_pos,
            pool.draft_len,
        )
        key = ("verify", pool.name, self.spec_w, n_rounds, rows)
        out = self._run_program(
            key, _verify_rounds_program, args, args[:1] + args[2:14],
            kwargs={"w": self.spec_w, "n_rounds": n_rounds, "rows": rows},
            lower_only=lower_only, donate_idx=(1, 2, 3, 4, 6, 7, 11),
        )
        pool.compiled_verify.add((n_rounds, rows))
        if lower_only:
            return None
        (
            pool.cache_k,
            pool.cache_v,
            pool.cache_len,
            pool.last_tok,
            pool.out_tokens,
            pool.n_emitted,
            pool.done,
            pool.draft_pos,
            status,
        ) = out
        return status

    def _dispatch_decode_dual(self, k: int, lower_only: bool = False):
        """K steps for BOTH pools in one program (weights stream once).
        Returns (status_short, status_long) device handles."""
        a, b = self.short, self.long
        args = (
            self.transcriber.params,
            self.cfg,
            a.cache_k, a.cache_v, a.cache_len, a.last_tok,
            a.out_tokens, a.n_emitted, a.done, a.bias, a.budgets,
            b.cache_k, b.cache_v, b.cache_len, b.last_tok,
            b.out_tokens, b.n_emitted, b.done, b.bias, b.budgets,
            k,
        )
        key = ("decode_dual", k)
        out = self._run_program(
            key, _decode_k_dual_program, args, args[:1] + args[2:-1],
            lower_only=lower_only,
            donate_idx=(1, 2, 3, 4, 6, 7, 10, 11, 12, 13, 15, 16),
        )
        if lower_only:
            return None, None
        (
            a.cache_k, a.cache_v, a.cache_len, a.last_tok,
            a.out_tokens, a.n_emitted, a.done, status_a,
            b.cache_k, b.cache_v, b.cache_len, b.last_tok,
            b.out_tokens, b.n_emitted, b.done, status_b,
        ) = out
        return status_a, status_b

    # ---------------- scheduler ----------------

    def _note_short_queue(self, q_ms: float) -> None:
        """Fold one reaped interim's admission wait into the congestion
        EMA read by eager_ok (see the __init__ field comment)."""
        self.short_queue_ema = 0.9 * self.short_queue_ema + 0.1 * q_ms

    def eager_ok(self) -> bool:
        """Launch gate for sessions' eager (speculative-endpoint) finals
        (serve/session.py _start_eager). Conditions:

        - capacity (structural): the long pool must have slack, so
          discarded speculation never displaces confirmed finals or file
          segments — instantaneous free-slot fraction, live streams must
          not outnumber long slots (a synchronized final wave would
          oversubscribe the pool even without bets — the 100-stream
          regression class), an empty final-class backlog (a bet that must
          WAIT for a slot has no latency advantage and clogs admission),
          and a cap on concurrent speculative slots (half the pool);
        - congestion (measured): no recent interim admission queueing —
          smoothed EMA of per-reap admission wait vs budget;
        - measured confirmation rate: sessions report each bet's outcome
          (eager_outcome), and below the floor the gate closes except for
          every 8th candidate, which launches as a measurement probe — on a
          drifting-phase workload (speech usually resumes after one silent
          window) losing bets at full budget stole enough weight-bandwidth
          to double interim p50 (EAGER_FINALS_BENCH.json worstcase_eager_on
          pre-gate: 406 vs 218 ms), while the probes keep the EMA live so
          an utterance-shaped workload reopens it within ~8 endpoints.
        """
        if self.long.free * 4 < len(self.long.slots):
            return False
        if self.N_STREAMS - len(self._free_streams) > len(self.long.slots):
            # more live streams than long slots: a synchronized final wave
            # oversubscribes the pool even WITHOUT speculation, so bets can
            # only displace confirmed work. This is the structural form of
            # the 100-streams-on-64-slots regression: the congestion signals
            # alone reopened the gate whenever the (faster) int8 decode kept
            # queue waits under budget, and the bet waves still thrashed
            # (SCALE_BENCH int8 committed p50 2.3 -> 4.2 s).
            return False
        if self._ring_backlog:
            # confirmed work is already waiting for long slots
            return False
        n_spec = sum(
            1
            for s in self.long.slots
            if s.active and getattr(s.request, "speculative", False)
        )
        if n_spec >= max(1, len(self.long.slots) // 2):
            return False
        if self.short_queue_ema > self.eager_queue_budget_ms:
            # no slack: interims recently queued for admission — speculation
            # would compound the congestion (SCALE_BENCH 100-stream
            # regression). Self-regulating: closed launches let the queue
            # drain, the EMA decays clear, the gate reopens.
            return False
        self._fold_eager_outcomes()
        if self.eager_accept_ema >= self.eager_accept_min:
            return True
        self._eager_probe += 1
        return self._eager_probe % 8 == 0

    def eager_outcome(self, confirmed: bool) -> None:
        """Session-reported result of one eager bet: True when the gate
        confirmed the speech end and the speculative final was committed,
        False when speech resumed (decode discarded) or the commit could not
        use it (range/duration mismatch). Buffered; folds into the EMA once
        per eager_window_s (burst resistance — see the field comment)."""
        self._eager_pending.append(bool(confirmed))
        self._fold_eager_outcomes()

    def _fold_eager_outcomes(self) -> None:
        now = time.perf_counter()
        if not self._eager_pending or (
            now - self._eager_fold_t < self.eager_window_s
        ):
            return
        mean = sum(self._eager_pending) / len(self._eager_pending)
        self._eager_pending.clear()
        self._eager_fold_t = now
        self.eager_accept_ema = 0.9 * self.eager_accept_ema + 0.1 * mean
        self.stats["eager_accept_ema"] = round(self.eager_accept_ema, 3)

    def confirm_speculative(self, stream_idx: int) -> None:
        """Promote a stream's in-flight eager final from speculative to
        confirmed: the VAD gate certified the speech end, so the decode is
        now real committed work and _pick_k may k-escalate for it during
        short-quiet windows (the escalation it was denied while the bet
        was still open)."""
        for s in self.long.slots:
            r = s.request
            if (
                s.active
                and getattr(r, "speculative", False)
                and getattr(r, "stream_idx", None) == stream_idx
            ):
                r.speculative = False
        for r in self._ring_backlog:
            if r.speculative and r.stream_idx == stream_idx:
                r.speculative = False
        # a synchronized final wave can outnumber the slot pool: requests
        # still sitting in the intake queue at confirmation must not stay
        # marked speculative for their whole (post-confirmation) decode
        for r in list(getattr(self._ring_requests, "_queue", ())):
            if (
                isinstance(r, _RingTranscribeReq)
                and r.speculative
                and r.stream_idx == stream_idx
            ):
                r.speculative = False

    def _sweep_cancelled(self) -> None:
        """Free slots and drop backlog entries whose caller cancelled (eager
        finals discarded on speech resume; disconnected clients). A freed
        slot's device row simply stops being driven — the next prefill into
        the slot resets it — so abandoning mid-decode costs nothing beyond
        the steps already taken (extra rows ride a weight-bandwidth-bound
        decode for free)."""
        n = 0
        for pool in self.pools:
            for s in pool.slots:
                if (
                    s.active
                    and s.request is not None
                    and s.request.future.cancelled()
                ):
                    s.active = False
                    s.request = None
                    s.drafted = False
                    n += 1
        if n:
            self.stats["cancelled_slots"] = (
                self.stats.get("cancelled_slots", 0) + n
            )
        if any(r.future.done() for r in self._ring_backlog):
            self._ring_backlog = [
                r for r in self._ring_backlog if not r.future.done()
            ]
        if any(r.future.done() for r in self._host_backlog):
            self._host_backlog = [
                r for r in self._host_backlog if not r.future.done()
            ]

    @property
    def _n_active(self) -> int:
        return sum(p.n_active for p in self.pools)

    def _run_tick_guarded(self, vad_batch, ring_vad_batch) -> None:
        """Executor entry for one tick. The busy counter is thread-truth:
        it stays correct even if the event loop that dispatched a wedged
        tick stops or closes (an asyncio future chained to a dead loop
        never resolves, so loop-side state can't be trusted for this).
        start() refuses to spawn a scheduler while it is non-zero.

        If the scheduler crashed (stall abort) while this tick was stuck,
        the tick kept mutating pool state after the crash handler's sweep —
        it may have popped backlog requests and admitted them to slots,
        orphaning their futures. Re-sweep on the way out, under the same
        lock start() takes, so the sweep cannot clobber a scheduler that
        already restarted (restart is only possible at busy==0, and a
        restart clears _crashed before the next tick can observe it)."""
        with self._tick_lock:
            self._tick_busy += 1
        try:
            self._tick(vad_batch, ring_vad_batch)
        finally:
            with self._tick_lock:
                self._tick_busy -= 1
                if self._crashed:
                    self._fail_pending(RuntimeError("batcher crashed"))

    def _run_replay_thunk(self, thunk) -> None:
        """One idle-tick warmup replay (device thread). Failures only cost
        the warmup benefit — the program itself stays registered and its
        first real dispatch retries."""
        try:
            thunk()
            np.asarray(self.long.cache_len[:1])  # drain before next tick
        except Exception:
            logger.exception("background warmup replay failed")

    async def _scheduler(self) -> None:
        loop = asyncio.get_running_loop()
        try:
            while self._running:
                # a 3 ms coalescing window lets lockstep sessions' gate
                # windows and chunks share one batch/upload
                if (
                    not self._vad_requests.empty()
                    or not self._vad_ring_requests.empty()
                ):
                    await asyncio.sleep(0.003)

                vad_batch = []
                while not self._vad_requests.empty():
                    vad_batch.append(self._vad_requests.get_nowait())
                ring_vad_batch = []
                while not self._vad_ring_requests.empty():
                    ring_vad_batch.append(self._vad_ring_requests.get_nowait())
                # drain everything into the backlogs; the tick admits what
                # fits each pool and carries the overflow forward
                while not self._ring_requests.empty():
                    self._ring_backlog.append(self._ring_requests.get_nowait())
                while not self._requests.empty():
                    self._host_backlog.append(self._requests.get_nowait())

                did_work = bool(
                    self._ingest_pending
                    or vad_batch
                    or ring_vad_batch
                    or self._ring_backlog
                    or self._host_backlog
                    or self._n_active
                    or self._pending_results
                )
                if did_work:
                    # one executor hop per tick: dispatch every phase, then
                    # resolve the PREVIOUS tick's device results — the fetch
                    # RTT overlaps this tick's device execution (pipelined)
                    fut = loop.run_in_executor(
                        None,
                        self._run_tick_guarded,
                        vad_batch,
                        ring_vad_batch,
                    )
                    try:
                        await asyncio.wait_for(
                            asyncio.shield(fut), self.tick_stall_dump_s
                        )
                    except asyncio.TimeoutError:
                        # a tick stuck this long means a device fetch hung
                        # (observed on the tunnel backend after sustained
                        # overload). The tick cannot be SAFELY abandoned —
                        # it mutates pool state — so dump every thread's
                        # stack and keep waiting, but only up to
                        # tick_stall_abort_s: past that the device runtime
                        # is declared wedged and the scheduler crashes,
                        # failing every in-flight future (the alternative
                        # is every session hanging forever; the stuck
                        # fetch thread itself is uncancellable, so the
                        # supervisor's process restart is the remedy).
                        import faulthandler

                        logger.error(
                            "scheduler tick stalled > %.0f s — device fetch "
                            "hung? dumping all thread stacks",
                            self.tick_stall_dump_s,
                        )
                        faulthandler.dump_traceback(all_threads=True)
                        waited = self.tick_stall_dump_s
                        while True:
                            try:
                                await asyncio.wait_for(
                                    asyncio.shield(fut),
                                    self.tick_stall_dump_s,
                                )
                                break
                            except asyncio.TimeoutError:
                                waited += self.tick_stall_dump_s
                                if waited >= self.tick_stall_abort_s:
                                    # retrieve the abandoned tick's
                                    # eventual result silently: when the
                                    # wedged thread finally returns or
                                    # raises, asyncio would otherwise log
                                    # 'exception was never retrieved' into
                                    # a dead engine. (The thread's own
                                    # teardown in _run_tick_guarded — not
                                    # this loop-bound callback, which dies
                                    # with the loop — handles the busy
                                    # count and the post-crash re-sweep.)
                                    fut.add_done_callback(
                                        lambda f: f.exception()
                                    )
                                    raise RuntimeError(
                                        f"device fetch wedged > {waited:.0f}"
                                        " s — abandoning the engine; "
                                        "restart the process"
                                    )

                self.stats["ticks"] += 1
                if not did_work:
                    if self._replay_queue:
                        # fully idle: link+execute ONE deferred warmup
                        # replay (same executor serialization as ticks);
                        # re-check the queues between thunks so a request
                        # arriving mid-drain waits at most one thunk
                        thunk = self._replay_queue.popleft()
                        await loop.run_in_executor(
                            None, self._run_replay_thunk, thunk
                        )
                        self.stats["warmup_replay_pending"] = len(
                            self._replay_queue
                        )
                        continue
                    self._wake.clear()
                    try:
                        await asyncio.wait_for(self._wake.wait(), timeout=1.0)
                    except asyncio.TimeoutError:
                        pass
                else:
                    # yield so the serving layer can ingest between ticks
                    await asyncio.sleep(0)
        except asyncio.CancelledError:
            pass
        except Exception:
            self._crashed = True
            logger.exception("batcher scheduler crashed")
            exc = RuntimeError("batcher crashed")
            for pool in self.pools:
                for s in pool.slots:
                    if s.active and s.request and not s.request.future.done():
                        s.request.future.set_exception(exc)
            for req in self._ring_backlog + self._host_backlog:
                if not req.future.done():
                    req.future.set_exception(exc)
            self._fail_pending(exc)
        finally:
            self._fail_pending(RuntimeError("batcher stopped"))

    def _fail_pending(self, exc: Exception) -> None:
        """Fail everything the stopped scheduler can no longer serve: parked
        VAD futures, in-flight decode requests (theirs are parked too),
        active slots, and the backlogs — otherwise awaiting callers hang on
        a clean stop."""

        def fail(fut: asyncio.Future) -> None:
            if fut is not None and not fut.done():
                # re-check done() INSIDE the scheduled callback: the crash
                # handler (loop thread) and the wedged tick's teardown
                # re-sweep (executor thread) can both observe the same
                # not-yet-failed future — set_exception is only applied
                # when the loop runs the callback, so the outer check
                # alone would let the second sweep raise InvalidStateError
                # into the event loop mid-incident
                def _set(fut=fut):
                    if not fut.done():
                        fut.set_exception(exc)
                try:
                    fut.get_loop().call_soon_threadsafe(_set)
                except RuntimeError:
                    pass  # loop already closed; nothing is awaiting

        pending, self._pending_results = self._pending_results, None
        if pending:
            for chunk in pending.get("ring_vad_batch", ()):
                for r in chunk:
                    fail(r.future)
        for pool in self.pools:
            for s in pool.slots:
                if s.active and s.request is not None:
                    fail(s.request.future)
                s.active = False
                s.request = None
                s.drafted = False
        backlogs = self._ring_backlog + self._host_backlog
        self._ring_backlog, self._host_backlog = [], []
        for req in backlogs:
            fail(req.future)
        # requests still sitting in the intake queues (enqueued while the
        # scheduler was blocked on a wedged tick and never drained into
        # the backlogs) would otherwise be orphaned: the crash sweep
        # missed them and a restart recreates _requests/_vad_requests,
        # stranding the old entries forever. get_nowait from a non-loop
        # thread is tolerable here: the scheduler that normally consumes
        # these queues is already dead, and producers enqueue only after
        # a successful start().
        for q in (
            self._requests, self._vad_requests,
            self._ring_requests, self._vad_ring_requests,
        ):
            while True:
                try:
                    fail(q.get_nowait().future)
                except asyncio.QueueEmpty:
                    break

    def _tick(
        self,
        vad_batch: list[_VadReq],
        ring_vad_batch: list[_VadRingReq],
    ) -> None:
        """One full scheduler tick on the device thread, PIPELINED: dispatch
        this tick's programs first, then resolve the PREVIOUS tick's device
        results. The blocking device_get's ~27 ms tunnel RTT then overlaps
        this tick's decode execution instead of stalling the loop (measured:
        a d2h fetch does not wait for later-dispatched programs). Finished
        requests are reaped one tick late; in exchange every tick's RTT is
        hidden, which is a strict win at realtime tick rates."""
        trace = self.tick_trace
        if trace is not None:
            self._trace_admit = {
                "prep_ms": 0.0, "write_ms": 0.0, "dispatch_ms": 0.0,
                "groups_short": 0, "groups_long": 0,
            }
        t0 = time.perf_counter()
        self._sweep_cancelled()
        # 0) ship ALL sessions' new audio chunks in ONE packed upload
        if self._ingest_pending:
            self._scatter_ingest()
        t_ingest = time.perf_counter()

        # 1) VAD programs (dispatch only; host-audio VAD resolves inline).
        # Ring batches split to the largest compiled bucket: a lockstep
        # burst from >64 streams dispatches as multiple programs.
        vad_done = self._run_vad_batch(vad_batch) if vad_batch else None
        ring_vad_chunks = _chunked(ring_vad_batch, _VAD_BATCH_BUCKETS[-1])
        ring_vad_probs = [self._dispatch_vad_ring(c) for c in ring_vad_chunks]
        # a failed dispatch resolves its chunk's futures with the error
        ring_vad_pairs = [
            (p, c) for p, c in zip(ring_vad_probs, ring_vad_chunks)
            if p is not None
        ]
        t_vad = time.perf_counter()

        # 2) admits (dispatch only). If a pool is starved while its class
        # has a burst waiting, resolve the previous tick NOW (one early RTT)
        # to free its finished slots. With ration_long_admits (default OFF
        # — the same-process A/B in MIXED_BENCH.json r4 measured the
        # deferral a net loss: two host-prep passes per tick and the early
        # resolve's blocking RTT cost more than the device-queue ordering
        # won) long-class admits are deferred until AFTER the short decode
        # dispatch in step 3. The fused-dual mode always uses the combined
        # order: its single decode program needs both pools admitted first.
        if self._ring_backlog or self._host_backlog:
            if self._pending_results is not None and self._any_pool_starved():
                self._resolve_pending()
            self._admit_backlogs(
                only=self.short
                if (self.ration_long_admits and not self.fuse_dual)
                else None
            )
        else:
            # no waiting work: clear the stale routing flag so the long
            # pool's pending-cap exception (_pick_k) isn't suppressed by a
            # short-class wait that has since been admitted
            self._backlog_has_short = False
        t_admit = time.perf_counter()

        # 3) decode K steps per pool (dispatch only), short pool first, with
        # long admits between the two dispatches. If every active slot has
        # provably exhausted its budget (the device is surely done), resolve
        # FIRST — otherwise we'd dispatch a wasted k=1 program and delay
        # every finish by one more tick.
        early = self._pending_results is not None and self._all_surely_done()
        if early:
            self._resolve_pending()
        t_early = time.perf_counter()
        if self.fuse_dual:
            parked = self._dispatch_decode_all()
        else:
            parked = []
            if self.short.n_active > 0:
                self._dispatch_decode_pool(self.short, parked)
            if self.ration_long_admits and (
                self._ring_backlog or self._host_backlog
            ):
                self._admit_backlogs(only=self.long)
            if self.long.n_active > 0:
                self._dispatch_decode_pool(self.long, parked)
        t_decode = time.perf_counter()

        # 4) resolve the PREVIOUS tick's results (fetch overlaps step-3 work:
        # everything fetched here was produced by programs dispatched LAST
        # tick, so the only wait is their remaining execution + one RTT)
        self._resolve_pending()
        del vad_done
        t_resolve = time.perf_counter()

        # 5) park this tick's device handles for the next tick (out_tokens is
        # not donated, so these handles stay valid across later dispatches)
        if ring_vad_pairs or parked:
            self._pending_results = {
                "ring_vad": [p for p, _ in ring_vad_pairs],
                "ring_vad_batch": [c for _, c in ring_vad_pairs],
                "pools": parked,
            }
        if trace is not None:
            trace.append({
                "t": t0,
                "ingest_ms": (t_ingest - t0) * 1e3,
                "vad_dispatch_ms": (t_vad - t_ingest) * 1e3,
                "admit_ms": (t_admit - t_vad) * 1e3,
                "early_resolve_ms": (t_early - t_admit) * 1e3,
                "decode_dispatch_ms": (t_decode - t_early) * 1e3,
                "resolve_ms": (t_resolve - t_decode) * 1e3,
                "total_ms": (t_resolve - t0) * 1e3,
                "early": early,
                "n_vad": len(vad_batch) + len(ring_vad_batch),
                # remaining steps after this tick's dispatch (0 = surely
                # done next tick)
                "remain_max": [
                    (p.name, max((s.budget - 1 - s.steps_seen)
                                 for s in p.slots if s.active))
                    for p in self.pools if any(s.active for s in p.slots)
                ],
                "active": [
                    (p.name, sum(1 for s in p.slots if s.active))
                    for p in self.pools
                ],
                "admit_detail": self._trace_admit,
            })

    # ---------------- device work ----------------

    def _all_surely_done(self) -> bool:
        """True if every active slot has already been driven past its token
        budget (n starts at 1 after prefill, so steps_seen >= budget-1 means
        the device-side done flag is guaranteed set)."""
        any_active = False
        for pool in self.pools:
            for s in pool.slots:
                if s.active:
                    any_active = True
                    if s.steps_seen < s.budget - 1:
                        return False
        return any_active

    def _any_pool_starved(self) -> bool:
        """True if a backlogged request targets a pool with zero free slots
        (same routing the admit path uses)."""
        for req in self._ring_backlog:
            cb = self._pick_chunk_bucket(req.chunk_count)
            pool = self._pool_for(
                cb * 1024 // 160, req.max_new_tokens,
                self._req_suffix_bucket(req),
            )
            if pool.free == 0:
                return True
        tr = self.transcriber
        from sonicscribe_tpu.audio.mel import frame_count

        for req in self._host_backlog:
            pool = req.pool_hint
            if pool is None:
                est = int(len(req.audio) * 16000 / max(req.sample_rate, 1))
                bucket = tr._pick_bucket(max(1, frame_count(est, tr.mel_cfg)))
                pool = self._pool_for(
                    bucket, req.max_new_tokens,
                    self._req_suffix_bucket(req),
                )
            if pool.free == 0:
                return True
        return False

    def _resolve_pending(self) -> None:
        """Fetch + resolve the parked previous-tick device results. The VAD
        probabilities and the SHORT pool's results come back in the first
        transfer and resolve immediately — a combined fetch would make every
        interim wait for the long pool's (much longer) finals program. Each
        fetch's RTT overlaps the already-dispatched current tick's device
        work, so the extra transfer costs host time only."""
        prev, self._pending_results = self._pending_results, None
        if not prev:
            return
        pools = list(prev.get("pools", ()))
        first: dict = {}
        if prev.get("ring_vad"):
            first["ring_vad"] = prev["ring_vad"]  # list of per-chunk probs
        if pools and pools[0][0] is self.short:
            first["status"], first["tokens"] = pools[0][1], pools[0][2]
        host = jax.device_get(first) if first else {}
        if "ring_vad" in host:
            for probs_host, chunk in zip(host["ring_vad"], prev["ring_vad_batch"]):
                self.stats["vad_batches"] += 1
                for j, r in enumerate(chunk):
                    r.future.get_loop().call_soon_threadsafe(
                        _resolve_quietly, r.future, float(probs_host[j])
                    )
        if "status" in host:
            self._reap_decode(self.short, host["status"], host["tokens"], pools[0][3])
            pools = pools[1:]
        for pool, status, tokens, reqs in pools:
            host2 = jax.device_get({"status": status, "tokens": tokens})
            self._reap_decode(pool, host2["status"], host2["tokens"], reqs)

    def _scatter_ingest(self) -> None:
        """Pack every pending chunk from every session into one int16 upload
        + one scatter program (dispatch only; no host wait)."""
        from sonicscribe_tpu.engine.ring import (
            _SCATTER_BUCKETS,
            scatter_chunks_program,
        )

        pending, self._ingest_pending = self._ingest_pending, []
        i = 0
        while i < len(pending):
            group = pending[i : i + _SCATTER_BUCKETS[-1]]
            i += len(group)
            M = next(b for b in _SCATTER_BUCKETS if b >= len(group))
            packed = np.zeros((M, 1024), np.int16)
            stream_idx = np.full((M,), self.trash_stream, np.int32)
            chunk_ids = np.zeros((M,), np.int32)
            for j, (s, c, arr) in enumerate(group):
                packed[j] = arr
                stream_idx[j] = s
                chunk_ids[j] = c
            self._run_scatter(
                jnp.asarray(packed), jnp.asarray(stream_idx),
                jnp.asarray(chunk_ids),
            )
            self.stats["scatter_programs"] = self.stats.get("scatter_programs", 0) + 1

    def _dispatch_vad_ring(self, batch: list[_VadRingReq]):
        """Dispatch the batched ring-VAD program; returns the device probs
        array (fetched later in the tick's combined transfer)."""
        try:
            B = next(b for b in _VAD_BATCH_BUCKETS if b >= len(batch))
            stream_idx = np.full((B,), self.trash_stream, np.int32)
            start = np.zeros((B,), np.int32)
            active = np.zeros((B,), bool)
            for j, r in enumerate(batch):
                stream_idx[j] = r.stream_idx
                start[j] = r.start_chunk
                active[j] = True
            # padding rows read row 0's state but never write it back
            safe_idx = np.where(stream_idx >= self.N_STREAMS, 0, stream_idx)
            probs, self.vad_states = self._run_vad_ring(
                jnp.asarray(safe_idx), jnp.asarray(start), jnp.asarray(active)
            )
            return probs
        except Exception as e:
            logger.exception("ring vad batch failed")
            for r in batch:
                if not r.future.done():
                    r.future.get_loop().call_soon_threadsafe(r.future.set_exception, e)
            return None

    def _pick_chunk_bucket(self, count: int) -> int:
        for b in self.chunk_buckets:
            if count <= b:
                return b
        return self.chunk_buckets[-1]

    def _admit_backlogs(self, only: "_CachePool | None" = None) -> None:
        """Route backlogged requests to their pools by cache need; admit what
        fits each pool's free slots, carry the overflow to the next tick.
        Latency-priority: short-budget (interim) requests first — the tick
        admits (and decodes) the short pool BEFORE any long-pool admission
        via two `only=`-scoped calls. While the short class is BUSY,
        long-pool admissions are additionally PACED (a file job's 12-segment
        burst admitted in one tick costs ~300 ms of host prep + prefill
        dispatch, which every interim behind it eats as queue wait — the
        mixed-workload p95 tail, MIXED_BENCH); quiet phases admit everything
        at once for throughput."""
        scope = self.pools if only is None else (only,)
        free = {id(p): p.free for p in scope}
        if id(self.long) in free and not self._short_quiet():
            free[id(self.long)] = min(
                free[id(self.long)], self.busy_long_admit_cap
            )
        # the short-scoped (or unscoped) call owns the waiting-interim flag;
        # the later long-scoped call must not clear what it just learned
        track_short = only is None or only is self.short
        if track_short:
            self._backlog_has_short = False
        if self._ring_backlog:
            keep: list[_RingTranscribeReq] = []
            take: dict[int, list[_RingTranscribeReq]] = {}
            for req in sorted(self._ring_backlog, key=lambda r: r.max_new_tokens):
                cb = self._pick_chunk_bucket(req.chunk_count)
                pool = self._pool_for(
                    cb * 1024 // 160, req.max_new_tokens,
                    self._req_suffix_bucket(req),
                )
                if free.get(id(pool), 0) > 0:
                    free[id(pool)] -= 1
                    take.setdefault(id(pool), []).append(req)
                else:
                    keep.append(req)
                    if track_short and pool is self.short:
                        self._backlog_has_short = True
            self._ring_backlog = keep
            for pool in scope:
                items = take.get(id(pool))
                if items:
                    self._admit_ring_grouped(pool, items)
        if self._host_backlog:
            keep_h: list[_TranscribeReq] = []
            take_h: dict[int, list[_TranscribeReq]] = {}
            from sonicscribe_tpu.audio.mel import frame_count

            tr = self.transcriber
            for req in sorted(self._host_backlog, key=lambda r: r.max_new_tokens):
                pool = req.pool_hint
                if pool is None:
                    est = int(len(req.audio) * 16000 / max(req.sample_rate, 1))
                    bucket = tr._pick_bucket(max(1, frame_count(est, tr.mel_cfg)))
                    pool = self._pool_for(
                        bucket, req.max_new_tokens,
                        self._req_suffix_bucket(req),
                    )
                if free.get(id(pool), 0) > 0:
                    free[id(pool)] -= 1
                    take_h.setdefault(id(pool), []).append(req)
                else:
                    keep_h.append(req)
                    if track_short and pool is self.short:
                        self._backlog_has_short = True
            self._host_backlog = keep_h
            for pool in scope:
                items_h = take_h.get(id(pool))
                if items_h:
                    self._admit_grouped(pool, items_h)

    def _group_b_cap(self, pool: _CachePool, frame_bucket: int) -> int:
        """Largest prefill group size for this (pool, bucket) right now
        (interim-latency protection; see live_busy_prefill_frame_cap)."""
        if pool is self.short:
            return 10**9  # interim waves self-batch at a 1 s cadence
        if len(self._free_streams) >= self.N_STREAMS:
            return 10**9  # no realtime sessions: pure throughput (file RTF)
        if self._short_quiet():
            # silence phase: bigger groups, but still bounded — a quiet-
            # admitted program EXECUTES later and can collide with the next
            # speech phase's first interims (the mixed-workload p95 tail)
            return max(1, self.quiet_prefill_frame_cap // max(frame_bucket, 1))
        return max(1, self.live_busy_prefill_frame_cap // max(frame_bucket, 1))

    def _admit_ring_grouped(
        self, pool: _CachePool, reqs: list[_RingTranscribeReq]
    ) -> None:
        by_key: dict[tuple[int, int], list[_RingTranscribeReq]] = {}
        for req in reqs:
            bucket = self._pick_chunk_bucket(req.chunk_count)
            sb = self._req_suffix_bucket(req)
            by_key.setdefault((bucket, sb), []).append(req)
        for (bucket, sb), items in by_key.items():
            b_cap = self._group_b_cap(pool, bucket * 1024 // 160)
            idx = 0
            while idx < len(items):
                rest = len(items) - idx
                B = max(
                    (b for b in self.prefill_batch_choices
                     if b <= rest and b <= b_cap
                     and (bucket, sb, b) in pool.compiled_ring_prefill),
                    default=1,
                )
                self._admit_ring_group(pool, bucket, sb, items[idx : idx + B], B)
                idx += B

    def _admit_ring_group(
        self, pool: _CachePool, bucket: int, sb: int,
        items: list[_RingTranscribeReq], B: int,
    ) -> None:
        tr = self.transcriber
        free = [i for i, s in enumerate(pool.slots) if not s.active]
        slot_list = free[: len(items)]
        assert len(slot_list) == len(items), "scheduler overfilled slots"

        stream_idx = np.full((B,), self.trash_stream, np.int32)
        start = np.zeros((B,), np.int32)
        count = np.full((B,), 1, np.int32)
        suffixes = np.full((B, sb), self.cfg.pad_id, np.int32)
        suffix_lens = np.zeros((B,), np.int32)
        padded_slots = slot_list + [pool.trash_slot] * (B - len(items))
        prefix = None

        sbb = []
        for j, req in enumerate(items):
            prompt = build_prompt(tr.tokenizer, self.cfg, hotwords=req.hotwords)
            prefix = prompt.prefix_ids
            s_ids = prompt.suffix_ids[:sb]
            suffixes[j, : len(s_ids)] = s_ids
            suffix_lens[j] = len(s_ids)
            stream_idx[j] = req.stream_idx
            c = min(req.chunk_count, bucket)
            # over-long windows keep the tail-truncation semantics of the
            # host path (Transcriber clamp)
            start[j] = req.start_chunk
            count[j] = max(1, c)
            bias_ids = tr._hotword_token_ids(req.hotwords) if req.hotwords else None
            sbb.append((slot_list[j], bias_ids, req.max_new_tokens))
        ta = self._trace_admit
        t_w = time.perf_counter() if ta is not None else 0.0
        self._set_slot_state(
            pool,
            [
                (slot_idx, bias_ids_j, budget_j,
                 getattr(req, "draft_tokens", None))
                for (slot_idx, bias_ids_j, budget_j), req
                in zip(sbb, items)
            ],
            padded_slots,
        )
        if ta is not None:
            ta["write_ms"] += (time.perf_counter() - t_w) * 1e3
            ta[f"groups_{pool.name}"] += 1
            t_d = time.perf_counter()
        if prefix is None:
            prompt = build_prompt(tr.tokenizer, self.cfg)
            prefix = prompt.prefix_ids

        try:
            self._dispatch_ring_prefill(
                pool, stream_idx, start, count, prefix, padded_slots,
                suffixes, suffix_lens, bucket,
            )
        except Exception as e:
            logger.exception("ring prefill group failed")
            for req in items:
                if not req.future.done():
                    req.future.get_loop().call_soon_threadsafe(
                        req.future.set_exception, e
                    )
            return

        t_admit = time.perf_counter()
        if ta is not None:
            ta["dispatch_ms"] += (t_admit - t_d) * 1e3
        if pool is self.short:
            self._last_short_admit = t_admit
        for req, slot_idx in zip(items, slot_list):
            req.t_admit = t_admit
            st = pool.slots[slot_idx]
            st.request = req
            st.budget = req.max_new_tokens
            st.active = True
            st.steps_seen = 0
        self.stats["prefills"] += len(items)
        self.stats["prefill_programs"] = self.stats.get("prefill_programs", 0) + 1

    def _set_slot_drafts(self, pool: _CachePool, slot_drafts: list) -> None:
        """(slot, draft_tokens|None) pairs for one admit group — one batched
        device write of the speculative draft buffers. The first draft token
        is STRIPPED: prefill emits the first greedy token itself (tok0), and
        the draft's token 0 is the session's prediction of exactly that —
        when the bet misses, the first verify round rejects everything and
        the request decodes normally (lossless either way). Slots admitted
        WITHOUT a draft get draft_len=0, which degrades the verify program
        to 1 token/round for them (same HBM cost as a decode step)."""
        rows, lens, slots = self._prep_draft_rows(pool, slot_drafts)
        idx = jnp.asarray(slots, jnp.int32)
        pool.draft = pool.draft.at[idx].set(jnp.asarray(np.stack(rows)))
        pool.draft_len = pool.draft_len.at[idx].set(
            jnp.asarray(lens, jnp.int32)
        )
        pool.draft_pos = pool.draft_pos.at[idx].set(0)

    def _prep_draft_rows(self, pool: _CachePool, slot_drafts: list):
        """Host prep shared by the eager and fused write paths: draft rows/
        lens per slot + the drafted/spec_rounds slot bookkeeping."""
        W = pool.draft.shape[1]
        rows, lens, slots = [], [], []
        for slot, d in slot_drafts:
            use = (
                self.speculative
                and d is not None
                and len(d) > 1
                and self.spec_accept_ema >= self.spec_accept_min
            )
            if use:
                dd = np.asarray(d, np.int32)[1 : W + 1]
                row = np.full((W,), self.cfg.pad_id, np.int32)
                row[: len(dd)] = dd
                rows.append(row)
                lens.append(len(dd))
            else:
                rows.append(np.full((W,), self.cfg.pad_id, np.int32))
                lens.append(0)
            slots.append(slot)
            pool.slots[slot].drafted = bool(use)
            pool.slots[slot].spec_rounds = (
                -(-lens[-1] // self.spec_w) if use else 0
            )
        return rows, lens, slots

    def _set_slot_state(
        self, pool: _CachePool, entries: list, padded_slots: list
    ) -> None:
        """Per-slot admission state for one admit group. `entries` is
        [(slot, bias_ids, budget, draft_tokens)]; `padded_slots` is the
        prefill group's padded slot list (len = compiled B, padding rows =
        the pool's trash slot). With `fuse_slot_writes` the budget + draft
        buffers land in ONE device program keyed to the same B as the
        prefill (no extra grid dimension); hotword bias rows stay on the
        eager path (rare).

        Never-JIT-mid-serving guard: with an exec store present, the fused
        program only runs once its (pool, B) key is registered — warmup
        registers the whole ladder (`_warmup_slot_write`), and any group
        arriving before its key links routes through the eager writes
        (behavior-identical, parity-tested), the same structural fallback
        _pick_k's rung clamp gives the decode ladder."""
        key = ("slot_write", pool.name, len(padded_slots))
        fused = self.fuse_slot_writes and (
            self._router.store is None or key in self._router.execs
        )
        if not fused:
            self._set_slot_bias_budget(
                pool, [(s, b, bu) for s, b, bu, _ in entries]
            )
            self._set_slot_drafts(pool, [(s, d) for s, _, _, d in entries])
            return
        self._set_slot_bias(pool, [(s, b) for s, b, _, _ in entries])
        rows, lens, _slots = self._prep_draft_rows(
            pool, [(s, d) for s, _, _, d in entries]
        )
        B = len(padded_slots)
        W = pool.draft.shape[1]
        pad = B - len(entries)
        budget_vals = np.asarray(
            [bu for _, _, bu, _ in entries] + [0] * pad, np.int32
        )
        draft_rows = np.stack(
            rows + [np.full((W,), self.cfg.pad_id, np.int32)] * pad
        )
        draft_lens = np.asarray(lens + [0] * pad, np.int32)
        a = (
            pool.budgets, pool.draft, pool.draft_len, pool.draft_pos,
            jnp.asarray(np.asarray(padded_slots, np.int32)),
            jnp.asarray(budget_vals), jnp.asarray(draft_rows),
            jnp.asarray(draft_lens),
        )
        out = self._run_program(
            key, _slot_write_program, a, a, donate_idx=(0, 1, 2, 3)
        )
        pool.budgets, pool.draft, pool.draft_len, pool.draft_pos = out

    def _warmup_slot_write(self, pool: _CachePool, B: int,
                           lower_only: bool = False) -> None:
        """Pre-register the fused admit-state write for one (pool, B):
        all-padding rows aimed at the trash slot, so the dispatch pass can
        execute it against the live pool arrays (donate + rebind, real
        slots untouched). Until a key is registered, _set_slot_state
        routes that group through the eager writes."""
        W = pool.draft.shape[1]
        a = (
            pool.budgets, pool.draft, pool.draft_len, pool.draft_pos,
            jnp.full((B,), pool.trash_slot, jnp.int32),
            jnp.zeros((B,), jnp.int32),
            jnp.full((B, W), self.cfg.pad_id, jnp.int32),
            jnp.zeros((B,), jnp.int32),
        )
        out = self._run_program(
            ("slot_write", pool.name, B), _slot_write_program, a, a,
            lower_only=lower_only, donate_idx=(0, 1, 2, 3),
        )
        if not lower_only:
            pool.budgets, pool.draft, pool.draft_len, pool.draft_pos = out

    def _set_slot_bias(self, pool: _CachePool, slot_bias: list) -> None:
        """Hotword bias rows for one admit group (eager; rare path) —
        extracted from _set_slot_bias_budget so the fused-write path can
        reuse it without the budget write."""
        base = (
            jnp.zeros((self.cfg.decoder.vocab_size,), jnp.float32)
            if self._base_bias is None
            else self._base_bias
        )
        zero_slots = []
        for slot, bias_ids in slot_bias:
            if bias_ids is not None and len(bias_ids):
                row = base.at[jnp.asarray(bias_ids, jnp.int32)].add(
                    self.transcriber.hotword_bias_strength
                )
                pool.bias = pool.bias.at[slot].set(row)
                pool.bias_dirty[slot] = True
            elif pool.bias_dirty[slot]:
                zero_slots.append(slot)
                pool.bias_dirty[slot] = False
        if zero_slots:
            pool.bias = pool.bias.at[jnp.asarray(zero_slots, jnp.int32)].set(
                base[None]
            )

    def _set_slot_bias_budget(self, pool: _CachePool, slot_bias_budget: list) -> None:
        """(slot, bias_ids|None, budget) triples for one admit group — one
        batched budget write; hotword bias rows are BUILT ON DEVICE from the
        boosted token ids (a [V]-row upload costs ~240 KB, which at 50
        requests/s saturates host->device bandwidth)."""
        slots = [s for s, _, _ in slot_bias_budget]
        budgets = [b for _, _, b in slot_bias_budget]
        pool.budgets = pool.budgets.at[jnp.asarray(slots, jnp.int32)].set(
            jnp.asarray(budgets, jnp.int32)
        )
        self._set_slot_bias(pool, [(s, b) for s, b, _ in slot_bias_budget])

    def _prepare_request(self, req: _TranscribeReq):
        """Host+dispatch prep: -> (bucket, mel [T,nm], frames, suffix,
        suffix_len, bias_row) or None on failure (future gets the error)."""
        tr = self.transcriber
        try:
            x = tr.prepare_audio(req.audio, req.sample_rate)
            from sonicscribe_tpu.audio.mel import frame_count, log_mel_spectrogram

            frames = max(1, frame_count(int(x.shape[0]), tr.mel_cfg))
            bucket = tr._pick_bucket(frames)
            if frames > bucket:
                frames = bucket
                x = x[: bucket * tr.mel_cfg.hop_length]
            mel = log_mel_spectrogram(x, tr.mel_cfg, pad_to_frames=bucket)
            if jax.tree.leaves(tr.params)[0].dtype == jnp.bfloat16:
                mel = mel.astype(jnp.bfloat16)

            prompt = build_prompt(tr.tokenizer, self.cfg, hotwords=req.hotwords)
            s_ids = prompt.suffix_ids[:MAX_SUFFIX_TOKENS]
            sb = self._suffix_bucket(len(s_ids))
            suffix = np.full((sb,), self.cfg.pad_id, np.int32)
            suffix[: len(s_ids)] = s_ids
            bias_ids = tr._hotword_token_ids(req.hotwords) if req.hotwords else None
            return (
                bucket, mel, frames, prompt.prefix_ids, suffix, len(s_ids),
                bias_ids, sb,
            )
        except Exception as e:
            logger.exception("request prep failed")
            if not req.future.done():
                req.future.get_loop().call_soon_threadsafe(req.future.set_exception, e)
            return None

    def _admit_grouped(self, pool: _CachePool, reqs: list[_TranscribeReq]) -> None:
        """Group by mel bucket, split to compiled batch sizes, dispatch one
        prefill program per group."""
        by_key: dict[tuple[int, int], list] = {}
        ta = self._trace_admit
        t_prep = time.perf_counter() if ta is not None else 0.0
        for req in reqs:
            prep = self._prepare_request(req)
            if prep is None:
                continue
            # the routing estimate used pre-resample length; if the true
            # bucket routes elsewhere, re-queue WITH the resolved pool so the
            # next tick admits it there (a bare re-queue would re-estimate
            # identically and bounce forever)
            real_pool = self._pool_for(prep[0], req.max_new_tokens, prep[7])
            if real_pool is not pool:
                req.pool_hint = real_pool
                self._host_backlog.append(req)
                continue
            by_key.setdefault((prep[0], prep[7]), []).append((req, prep))
        if ta is not None:
            # host prep (resample + mel dispatch + prompt build) vs program
            # dispatch: the tick-trace decomposition that locates whether
            # admit_ms is host work or dispatch RTTs (MIXED_BENCH r5)
            ta["prep_ms"] += (time.perf_counter() - t_prep) * 1e3

        for (bucket, sb), items in by_key.items():
            b_cap = self._group_b_cap(pool, bucket)
            idx = 0
            while idx < len(items):
                rest = len(items) - idx
                # largest COMPILED batch size <= remaining (B=1 always compiled)
                B = max(
                    (b for b in self.prefill_batch_choices
                     if b <= rest and b <= b_cap
                     and (bucket, sb, b) in pool.compiled_prefill),
                    default=1,
                )
                self._admit_group(pool, bucket, items[idx : idx + B], B)
                idx += B

    def _admit_group(self, pool: _CachePool, bucket: int, items: list, B: int) -> None:
        free = [i for i, s in enumerate(pool.slots) if not s.active]
        slot_list = free[: len(items)]
        assert len(slot_list) == len(items), "scheduler overfilled slots"

        mels = jnp.stack([prep[1] for _, prep in items] +
                         [items[0][1][1]] * (B - len(items)))
        frames = np.asarray(
            [prep[2] for _, prep in items] + [bucket] * (B - len(items)), np.int32
        )
        prefix = items[0][1][3]
        suffixes = np.stack(
            [prep[4] for _, prep in items]
            + [items[0][1][4]] * (B - len(items))
        )
        suffix_lens = np.asarray(
            [prep[5] for _, prep in items] + [items[0][1][5]] * (B - len(items)),
            np.int32,
        )
        padded_slots = slot_list + [pool.trash_slot] * (B - len(items))

        ta = self._trace_admit
        t_w = time.perf_counter() if ta is not None else 0.0
        # per-slot bias/budget/draft state must land BEFORE the prefill
        self._set_slot_state(
            pool,
            [
                (slot_idx, prep[6], req.max_new_tokens,
                 getattr(req, "draft_tokens", None))
                for (req, prep), slot_idx in zip(items, slot_list)
            ],
            padded_slots,
        )
        if ta is not None:
            ta["write_ms"] += (time.perf_counter() - t_w) * 1e3
            ta[f"groups_{pool.name}"] += 1
            t_d = time.perf_counter()

        try:
            self._dispatch_prefill_group(
                pool, mels, frames, prefix, suffixes, suffix_lens, padded_slots
            )
        except Exception as e:
            logger.exception("prefill group failed")
            for req, _ in items:
                if not req.future.done():
                    req.future.get_loop().call_soon_threadsafe(
                        req.future.set_exception, e
                    )
            return

        t_admit = time.perf_counter()
        if ta is not None:
            ta["dispatch_ms"] += (t_admit - t_d) * 1e3
        if pool is self.short:
            self._last_short_admit = t_admit
        for (req, prep), slot_idx in zip(items, slot_list):
            req.t_admit = t_admit
            st = pool.slots[slot_idx]
            st.request = req
            st.budget = req.max_new_tokens
            st.active = True
            st.steps_seen = 0
        self.stats["prefills"] += len(items)
        self.stats["prefill_programs"] = self.stats.get("prefill_programs", 0) + 1

    def _pick_k(self, pool: _CachePool) -> int:
        """The device enforces exact budget/EOS stops; k only shapes latency:
        smallest choice >= min remaining finishes the most-urgent slot in ONE
        tick; capped while requests wait or realtime sessions are live so a
        long tick never delays anyone."""
        remaining = [
            max(1, s.budget - 1 - s.steps_seen) for s in pool.slots if s.active
        ]
        min_rem = max(1, min(remaining)) if remaining else 1
        choices = (
            self.dual_k_choices if pool is self.short else _DECODE_K_CHOICES
        )
        k = next((c for c in choices if c >= min_rem), choices[-1])
        # Quiet-window k-escalation is CONFIDENCE-PRICED for unconfirmed
        # eager finals. A lost bet's escalated k=32 scan blocks the resumed
        # speech's interims for hundreds of ms (EAGER_FINALS_BENCH
        # worstcase_eager_on pre-gate: interim p95 1.26 s), but denying
        # escalation to ALL unconfirmed bets erases the eager win in the
        # utterance regime where bets (almost) always confirm (measured:
        # committed p50 1057 ms gated vs ~460 ms escalated). So speculation
        # escalates while the measured bet-confirmation EMA is healthy
        # (>= eager_accept_min — the same signal that gates launches) and is
        # capped at the live k otherwise; sessions promote the request at
        # gate confirmation (confirm_speculative) either way.
        spec_escalate = self.eager_accept_ema >= self.eager_accept_min
        long_quiet_confirmed = (
            pool is self.long
            and self._short_quiet()
            and any(
                s.active
                and (
                    spec_escalate
                    or not getattr(s.request, "speculative", False)
                )
                for s in pool.slots
            )
        )
        if (
            self._ring_backlog
            or self._host_backlog
            or not self._requests.empty()
            or not self._ring_requests.empty()
            or not self._vad_ring_requests.empty()
            or not self._vad_requests.empty()
        ) and not long_quiet_confirmed:
            # EXCEPTION (COMMIT_LATENCY_BENCH): with the short class quiet,
            # the pending items are long-class finals (bounded by their own
            # multi-tick decode, which a larger k SPEEDS UP) and VAD gate
            # probes — and a quiet short class means the streams are in
            # their silence phase, where a k-program-delayed gate decision
            # costs nothing (speech starts are backdated to the window's
            # first chunk anyway)
            k = min(k, self.pending_k_cap)
        if len(self._free_streams) < self.N_STREAMS:
            # realtime sessions live: long-pool programs are capped harder —
            # an interim arriving mid-program waits for it, and a k=32 long
            # program blocks ~4x longer than a short one for the same
            # per-token cost (k only amortizes dispatch overhead). Measured
            # motivation: MIXED_BENCH.json's interim p95 spike during a
            # concurrent file burst (249 ms capped vs 1024 ms uncapped).
            # Applied INDEPENDENTLY of the pending-backlog cap: a sustained
            # file job whose segments overflow the slot pool keeps the
            # backlog non-empty, and the pending cap (16) alone would defeat
            # the tuned long cap exactly in that scenario.
            if pool is self.short:
                cap = self.live_k_cap
            elif long_quiet_confirmed:
                # short class quiet (silence phase): finals may run a
                # bigger k — the committed path gains k/long_live_k fewer
                # ticks per final (COMMIT_LATENCY_BENCH A/B) and ongoing
                # interim traffic suppresses this via the quiet window
                # (MIXED_BENCH protection)
                cap = self.long_idle_k_cap
            elif (
                self.N_STREAMS - len(self._free_streams)
                > len(self.long.slots)
                and self.short_queue_ema <= self.eager_queue_budget_ms
            ):
                # oversubscribed: more live streams than long slots — final
                # waves queue for slots, so a resident final's k-residency
                # multiplies the wave's makespan. k=16 here restored the
                # 100-stream committed collapse (p50 11.0 -> 1.36 s) with
                # interims unchanged (SCALE_BENCH knee_100/remedy_k16_100);
                # k=8 stays the cap below the threshold, where it won the
                # mixed-load A/B (MIXED_BENCH). Escalation may only spend
                # SHORT-CLASS SLACK (same rule as the eager gate, same EMA):
                # in the measured escalation-win regime interims were
                # healthy (knee_100 w2 p50 231 ms, queue-free), while a
                # mixed-load file burst queues interims and spikes the EMA —
                # there a 2x-longer long program is exactly the granularity
                # tax the k=8 cap was tuned against, so the cap stays put.
                cap = self.long_oversub_k_cap
            else:
                cap = self.long_live_k_cap
            k = min(k, cap)
        if self._warmed and (k, None) not in pool.compiled_decode:
            # fast boot defers the long pool's escalation rungs (k > live
            # cap) to background compile; until one registers, clamp to the
            # largest compiled rung below it — never JIT mid-serving
            reg = [c for c in choices if (c, None) in pool.compiled_decode]
            if reg:
                k = next((c for c in reversed(reg) if c <= k), reg[0])
        return k

    def _short_quiet(self) -> bool:
        """True when the short (interim) class is quiet: nothing in flight,
        nothing short-class backlogged, and no admission for short_quiet_s —
        i.e. the realtime streams are in a silence phase."""
        return (
            self.short.n_active == 0
            and not self._backlog_has_short
            and time.perf_counter() - self._last_short_admit > self.short_quiet_s
        )

    def _park(self, pool: _CachePool, status, k: int, parked: list) -> None:
        self.stats["decode_steps"] += k
        for s in pool.slots:
            if s.active:
                s.steps_seen += k
        # snapshot request identities: resolution happens a tick later,
        # and by then a reaped slot may already host a NEW request — a
        # stale negative status row must never finish the newcomer
        reqs = [s.request for s in pool.slots]
        parked.append((pool, status, pool.out_tokens, reqs))

    def _dispatch_decode_all(self) -> list:
        """Pick K and dispatch decode for every pool with active slots.
        When BOTH pools are active and fusion is on, one dual program streams
        the weights once for both classes (the dominant HBM term). Returns
        [(pool, status_dev, tokens_handle, reqs), ...] to park."""
        parked = []
        active = [p for p in self.pools if p.n_active > 0]
        if self.fuse_dual and len(active) == 2:
            # shared k = the SHORT pool's own choice: the latency-critical
            # class finishes in one tick, and the long pool rides along at
            # no extra weight-bandwidth cost (its done slots freeze on
            # device). min() over both pools would let a nearly-done long
            # slot throttle k to 1 and stretch an interim across many ticks.
            # Clamped to the compiled grid so a drifted short_budget can
            # never trigger a mid-serving JIT compile (multi-second stall).
            k = min(self._pick_k(self.short), self.dual_k_choices[-1])
            status_a, status_b = self._dispatch_decode_dual(k)
            self.stats["dual_decodes"] = self.stats.get("dual_decodes", 0) + 1
            self._park(self.short, status_a, k, parked)
            self._park(self.long, status_b, k, parked)
            return parked
        for pool in active:
            self._dispatch_decode_pool(pool, parked)
        return parked

    def _dispatch_decode_pool(self, pool: _CachePool, parked: list) -> None:
        """Pick K and dispatch one pool's decode (or verify) program; parks
        the handles. The tick calls this short-pool-first with long-pool
        admissions in between (mixed-workload rationing)."""
        k = self._pick_k(pool)
        rounds = self._pick_verify_rounds(pool, k)
        if rounds is not None:
            rows = self._pick_verify_rows(pool, rounds)
            status = self._dispatch_verify(pool, rounds, rows=rows)
            self.stats["verify_rounds"] = (
                self.stats.get("verify_rounds", 0) + rounds
            )
            for s in pool.slots:
                if s.active and s.drafted:
                    s.spec_rounds -= rounds
                    if s.spec_rounds <= 0:
                        # best-case consumption would have spent the
                        # draft by now; on rejection the device already
                        # invalidated it. Either way further verify
                        # rounds are 1-token rounds — go back to the
                        # plain ladder without waiting for the (one
                        # tick late) _SPEC_LIVE_FLAG status
                        s.drafted = False
            self._park(pool, status, rounds, parked)
            return
        status = self._dispatch_decode(pool, k, rows=self._pick_rows(pool, k))
        self._park(pool, status, k, parked)

    def _pick_verify_rounds(self, pool: _CachePool, k: int) -> int | None:
        """Use the speculative verify path when a DRAFTED slot is live in
        this pool: rounds = k clamped to the compiled verify ladder (one
        round costs ~one decode step of HBM, so the same k caps bound the
        interim-facing latency; drafted slots emit up to w+1 tokens per
        round, undrafted actives exactly 1 — bandwidth-neutral for them).
        None = use the plain k-step program. Slots whose draft is exhausted
        clear `drafted` via the _SPEC_LIVE_FLAG status bit (_reap_decode),
        so a pool with only spent drafts returns to the plain ladder (k up
        to long_idle_k_cap per dispatch, vs max 8 verify rounds)."""
        if not self.speculative:
            return None
        if not any(s.active and s.drafted for s in pool.slots):
            return None
        choices = sorted(
            {r for r, rw in pool.compiled_verify if rw is None}
        )
        if not choices:
            if self._warmed:
                return None  # verify grid not registered yet (fast warmup)
            # un-warmed engine (tests/dev): JIT on demand like every other
            # program before warmup
            choices = sorted(self.verify_rounds_choices)
        # size by NEED, not by k: rounds beyond the drafts' remaining
        # coverage are 1-token rounds (strictly worse than plain decode
        # steps at the same HBM cost), so pick the smallest compiled choice
        # covering the deepest live draft, clamped to the k cap
        needed = max(
            (s.spec_rounds for s in pool.slots if s.active and s.drafted),
            default=1,
        )
        cap = max((r for r in choices if r <= k), default=choices[0])
        for r in choices:
            if r >= min(needed, cap):
                return min(r, cap)
        return cap

    def _pick_verify_rows(self, pool: _CachePool, rounds: int) -> int | None:
        """Occupied-prefix rung for the verify program (same contract as
        _pick_rows, gated on compiled_verify)."""
        if not pool.rows_ladder:
            return None
        high = 0
        for i, s in enumerate(pool.slots):
            if s.active:
                high = i + 1
        for r in pool.rows_ladder:
            if r >= high and (rounds, r) in pool.compiled_verify:
                return r
        return None

    def _reap_decode(
        self, pool: _CachePool, status: np.ndarray, rows: np.ndarray, reqs: list
    ) -> None:
        """status/rows come from the SAME decode program (fetched together in
        the tick's combined transfer): a slot done at that program stays
        frozen by later programs, so its row is final. `reqs` is the per-slot
        request snapshot taken AT DISPATCH — only a slot still holding that
        same request may be finished by this status (the slot may have been
        reaped and re-admitted since)."""
        for i, s in enumerate(pool.slots):
            if not (s.active and s.request is not None and s.request is reqs[i]):
                continue
            st_i = int(status[i])
            if st_i < 0:
                self._finish(pool, i, rows[i], -st_i - 1)
            elif s.drafted and st_i < _SPEC_LIVE_FLAG:
                # draft exhausted (or a plain program ran, misaligning the
                # cursor — the next verify round would reject it anyway):
                # return this slot to the plain k-escalated decode ladder
                s.drafted = False

    def _finish(
        self, pool: _CachePool, slot_idx: int, row: np.ndarray, n_tokens: int
    ) -> None:
        st = pool.slots[slot_idx]
        req = st.request
        out = []
        for t in row[:n_tokens]:
            t = int(t)
            if t in (self.cfg.eos_id, self.cfg.pad_id):
                break
            out.append(t)
        text = self.transcriber.tokenizer.decode(out)
        if isinstance(req, _RingTranscribeReq):
            duration = req.duration_s
        else:
            duration = len(req.audio) / req.sample_rate
        now = time.perf_counter()
        dt = now - req.t_enqueue
        # latency decomposition (COMMIT_LATENCY_BENCH): queue = enqueue ->
        # prefill dispatch (admission wait), run = prefill dispatch -> reap
        # (device prefill + decode ticks + one-tick reap delay)
        queue_s = max(0.0, req.t_admit - req.t_enqueue) if req.t_admit else 0.0
        result = TranscribeResult(
            text=text,
            tokens=np.asarray(out, np.int32),
            audio_duration_s=duration,
            timings={
                "total_s": dt,
                "rtf": dt / max(duration, 1e-6),
                "queue_s": queue_s,
                "run_s": dt - queue_s,
            },
        )
        lat = self.stats.setdefault(
            pool.name + "_lat_ms", {"queue": [], "run": [], "tokens": []}
        )
        if len(lat["queue"]) < 4000:  # bounded; enough for a bench window
            lat["queue"].append(round(queue_s * 1e3, 1))
            lat["run"].append(round((dt - queue_s) * 1e3, 1))
            lat["tokens"].append(n_tokens)
        if pool is self.short:
            # congestion signal for the eager-finals launch gate (eager_ok)
            self._note_short_queue(queue_s * 1e3)
        draft = getattr(req, "draft_tokens", None)
        if self.speculative and draft is not None and len(draft) > 1:
            # acceptance = matching-prefix fraction of the draft vs the TRUE
            # greedy output — valid whether or not the draft was spent (the
            # verify path is lossless, so `out` is the greedy sequence
            # either way), which is what lets the gated-off EMA recover
            match = 0
            for a, b in zip(np.asarray(draft), out):
                if int(a) != int(b):
                    break
                match += 1
            acc = match / max(len(draft), 1)
            self.spec_accept_ema = 0.8 * self.spec_accept_ema + 0.2 * acc
            self.stats["spec_accept_ema"] = round(self.spec_accept_ema, 3)
        st.active = False
        st.request = None
        st.drafted = False
        if not req.future.done():
            req.future.get_loop().call_soon_threadsafe(req.future.set_result, result)

    def _run_vad_batch(self, batch: list[_VadReq]) -> None:
        for chunk in _chunked(batch, _VAD_BATCH_BUCKETS[-1]):
            self._run_vad_batch_one(chunk)

    def _run_vad_batch_one(self, batch: list[_VadReq]) -> None:
        try:
            n_sub = max(max(1, len(r.audio) // WINDOW_SAMPLES) for r in batch)
            B = next(b for b in _VAD_BATCH_BUCKETS if b >= len(batch))
            windows = np.zeros((B, n_sub, WINDOW_SAMPLES), np.float32)
            for j, r in enumerate(batch):
                n = min(len(r.audio), n_sub * WINDOW_SAMPLES)
                w = np.zeros(n_sub * WINDOW_SAMPLES, np.float32)
                w[:n] = r.audio[:n]
                windows[j] = w.reshape(n_sub, WINDOW_SAMPLES)

            per_req_states = [
                (r.state if r.state is not None else self.vad.init_state(1))
                for r in batch
            ]
            if B > len(batch):
                per_req_states.append(self.vad.init_state(B - len(batch)))
            states = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, 0), *per_req_states
            )

            if self._vad_program is None or self._vad_n_sub != n_sub:
                self._vad_program = _make_vad_batch_program(self.vad, n_sub)
                self._vad_n_sub = n_sub
            probs, new_states = self._run_vad_host(
                jnp.asarray(windows), states
            )
            probs_host = np.asarray(probs)  # one fetch for the whole batch
            self.stats["vad_batches"] += 1
            for j, r in enumerate(batch):
                new_state_j = jax.tree.map(lambda x: x[j : j + 1], new_states)
                r.future.get_loop().call_soon_threadsafe(
                    _resolve_quietly, r.future, (float(probs_host[j]), new_state_j)
                )
        except Exception as e:
            logger.exception("vad batch failed")
            for r in batch:
                if not r.future.done():
                    r.future.get_loop().call_soon_threadsafe(r.future.set_exception, e)
