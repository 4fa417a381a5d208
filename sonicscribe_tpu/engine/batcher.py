"""Continuous batcher: packs concurrent sessions onto one TPU core.

THE core new engineering of the TPU build (SURVEY.md §2.5, §7 hard-part #1 —
no reference counterpart; the reference serializes every session through one
blocking model call, backend/transcription_manager.py:58).

Design:

- A fixed pool of S decode SLOTS shares one persistent KV cache
  [L, S, MAX_LEN, nkv, hd]. All shapes static; slots admit/free without
  recompilation.
- PREFILL: one compiled program per mel bucket runs encoder + prompt assembly
  + prefill and writes the new session's KV into its slot with
  `dynamic_update_slice` (donated cache, no copies), plus the first greedy
  token into the slot's DEVICE-SIDE output buffer. No host transfer at admit.
- DECODE: one compiled program runs K greedy steps for ALL slots at once
  (lax.scan over decode_step), with per-slot logit bias (hotwords). EOS and
  budget termination are tracked ON DEVICE; emitted tokens accumulate in a
  device buffer. The host fetches ONE tiny status vector per tick and a
  token row once per finished request.
- VAD: pending gate windows from all sessions are stacked and evaluated in
  one batched program per tick (SURVEY.md §2.9 "batched gating op").

Host-roundtrip discipline: on this hardware a device->host transfer costs
~27 ms RTT (remote-tunnel TPU), while dispatch is async and free. The tick
loop therefore transfers exactly one [S] status vector per K decode steps,
K adapts up to 64, and token text leaves the device once per request.

Exposes the same async interface as ThreadedEngine (transcribe /
vad_window_prob), so the serving layer swaps engines with a flag.
"""

from __future__ import annotations

import asyncio
import logging
import time
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
    assemble_prompt,
)
from sonicscribe_tpu.models.config import GlmAsrConfig
from sonicscribe_tpu.models.glm_asr import decode_step, prefill_kv
from sonicscribe_tpu.models.tokenizer import build_prompt
from sonicscribe_tpu.vad.model import WINDOW_SAMPLES

logger = logging.getLogger(__name__)

_DECODE_K_CHOICES = (1, 2, 4, 8, 16, 32, 64)
_VAD_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


# =====================================================================
# jitted programs
# =====================================================================


@partial(
    jax.jit,
    static_argnames=("cfg",),
    donate_argnums=(7, 8, 9, 10, 11, 12, 13),
)
def _prefill_slot_program(
    params,
    cfg: GlmAsrConfig,
    mel,  # [1, T_bucket, n_mels]
    n_frames,  # [] i32
    prefix_ids,  # [P]
    suffix_ids,  # [MAX_SUFFIX_TOKENS]
    suffix_len,  # [] i32
    cache_k,  # [L, S, MAX, nkv, hd]   (donated)
    cache_v,  # (donated)
    cache_len,  # [S] i32               (donated)
    last_tok,  # [S] i32               (donated)
    out_tokens,  # [S, MAX_NEW] i32    (donated)
    n_emitted,  # [S] i32              (donated)
    done,  # [S] bool                  (donated)
    bias_full,  # [S, V] f32
    budgets,  # [S] i32
    slot,  # [] i32
):
    """Admit one session into `slot`: encoder + prefill + KV write + token0,
    all device-side."""
    buf, total_len = assemble_prompt(
        params, cfg, mel, n_frames, prefix_ids, suffix_ids, suffix_len
    )
    ks, vs, last_logits = prefill_kv(params, cfg, buf, total_len)
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, ks.astype(cache_k.dtype), (0, slot, 0, 0, 0)
    )
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, vs.astype(cache_v.dtype), (0, slot, 0, 0, 0)
    )
    cache_len = cache_len.at[slot].set(total_len[0])

    tok0 = jnp.argmax(last_logits[0] + bias_full[slot], -1).astype(jnp.int32)
    last_tok = last_tok.at[slot].set(tok0)
    out_tokens = out_tokens.at[slot].set(0)  # clear the slot's row
    out_tokens = out_tokens.at[slot, 0].set(tok0)
    n_emitted = n_emitted.at[slot].set(1)
    done = done.at[slot].set((tok0 == cfg.eos_id) | (budgets[slot] <= 1))
    return cache_k, cache_v, cache_len, last_tok, out_tokens, n_emitted, done


@partial(
    jax.jit,
    static_argnames=("cfg", "k_steps"),
    donate_argnums=(2, 3, 4, 5, 6, 7, 8),
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
):
    """K greedy steps for all slots, fully device-side bookkeeping.

    Returns new state + status [S] i32 where status = (n_emitted+1) signed
    negative when done — ONE tiny host fetch tells the scheduler everything.
    """
    S, MAX_NEW = out_tokens.shape
    b_idx = jnp.arange(S)

    def step(carry, _):
        ck, cv, cl, tok, out, n, dn = carry
        cache = {"k": ck, "v": cv, "len": cl}
        cache, logits = decode_step(params, cfg, cache, tok, active=~dn)
        nxt = jnp.argmax(logits + bias, -1).astype(jnp.int32)
        nxt = jnp.where(dn, tok, nxt)  # frozen slots keep their token
        # append for active slots
        pos = jnp.minimum(n, MAX_NEW - 1)
        cur = out[b_idx, pos]
        out = out.at[b_idx, pos].set(jnp.where(dn, cur, nxt))
        n = jnp.where(dn, n, n + 1)
        dn = dn | (nxt == cfg.eos_id) | (n >= budgets)
        return (cache["k"], cache["v"], cache["len"], nxt, out, n, dn), None

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


@dataclass
class _TranscribeReq:
    audio: np.ndarray
    sample_rate: int
    max_new_tokens: int
    hotwords: Optional[list[str]]
    future: asyncio.Future
    t_enqueue: float


@dataclass
class _VadReq:
    audio: np.ndarray
    state: Any
    future: asyncio.Future


class BatchedEngine:
    """Continuous-batching engine; same interface as ThreadedEngine."""

    def __init__(
        self,
        transcriber: Transcriber,
        vad,
        slots: int = 8,
        max_decode_tokens: int = 256,
        cache_dtype=None,
    ):
        self.transcriber = transcriber
        self.vad = vad
        self.cfg = transcriber.cfg
        self.S = slots
        self.MAX_NEW = max_decode_tokens

        dec = self.cfg.decoder
        max_audio_tokens = max(transcriber.buckets) // self.cfg.frames_per_audio_token
        self.max_prompt = 3 + max_audio_tokens + MAX_SUFFIX_TOKENS
        self.MAX_LEN = self.max_prompt + max_decode_tokens
        dtype = cache_dtype or jax.tree.leaves(transcriber.params)[0].dtype
        if dtype == jnp.int8:  # quantized params: cache stays bf16
            dtype = jnp.bfloat16
        shape = (dec.n_layers, slots, self.MAX_LEN, dec.n_kv_heads, dec.head_dim)
        self.cache_k = jnp.zeros(shape, dtype)
        self.cache_v = jnp.zeros(shape, dtype)
        self.cache_len = jnp.zeros((slots,), jnp.int32)
        self.last_tok = jnp.zeros((slots,), jnp.int32)
        self.out_tokens = jnp.zeros((slots, max_decode_tokens), jnp.int32)
        self.n_emitted = jnp.zeros((slots,), jnp.int32)
        self.done = jnp.ones((slots,), bool)
        self.bias = jnp.zeros((slots, dec.vocab_size), jnp.float32)
        self.budgets = jnp.zeros((slots,), jnp.int32)

        self.slots = [_SlotState() for _ in range(slots)]
        self._vad_program = None
        self._vad_n_sub = -1
        self._requests: asyncio.Queue[_TranscribeReq] = asyncio.Queue()
        self._vad_requests: asyncio.Queue[_VadReq] = asyncio.Queue()
        self._wake = asyncio.Event()
        self._task: Optional[asyncio.Task] = None
        self._running = False
        self.stats = {"ticks": 0, "decode_steps": 0, "prefills": 0, "vad_batches": 0}
        # file pipeline may run this many segment decodes concurrently
        self.concurrency_hint = slots

    # ---------------- public async interface ----------------

    async def start(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is not None and getattr(self, "_loop", None) is not loop:
            # event loop changed (tests / restart): rebind queues and task
            self._task.cancel()
            self._task = None
        if self._task is None:
            self._loop = loop
            self._requests = asyncio.Queue()
            self._vad_requests = asyncio.Queue()
            self._wake = asyncio.Event()
            self._running = True
            self._task = asyncio.ensure_future(self._scheduler())

    async def transcribe(
        self,
        audio: np.ndarray,
        sample_rate: int,
        max_new_tokens: int,
        hotwords: Optional[list[str]] = None,
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

    def shutdown(self) -> None:
        self._running = False
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

    def warmup(self, budgets=(15, 200, 256)) -> None:
        """Synchronously compile the per-bucket prefill programs and the
        decode-k program grid (callable before the event loop starts)."""
        del budgets  # decode cost is per-k, not per-budget
        tr = self.transcriber
        prompt = build_prompt(tr.tokenizer, self.cfg)
        suffix = np.full((MAX_SUFFIX_TOKENS,), self.cfg.pad_id, np.int32)
        suffix[: len(prompt.suffix_ids)] = prompt.suffix_ids[:MAX_SUFFIX_TOKENS]
        dtype = self.cache_k.dtype
        for bucket in tr.buckets:
            mel = jnp.zeros((1, bucket, tr.mel_cfg.n_mels), dtype)
            self._dispatch_prefill(
                mel, bucket, np.asarray(prompt.prefix_ids), suffix,
                len(prompt.suffix_ids), 0,
            )
        for k in _DECODE_K_CHOICES:
            self._dispatch_decode(k)
        # reset slot state touched by warmup
        self.cache_len = jnp.zeros_like(self.cache_len)
        self.n_emitted = jnp.zeros_like(self.n_emitted)
        self.done = jnp.ones_like(self.done)
        jax.block_until_ready(self.cache_k)

    # ---------------- device dispatch helpers ----------------

    def _dispatch_prefill(self, mel, frames, prefix, suffix, suffix_len, slot_idx):
        (
            self.cache_k,
            self.cache_v,
            self.cache_len,
            self.last_tok,
            self.out_tokens,
            self.n_emitted,
            self.done,
        ) = _prefill_slot_program(
            self.transcriber.params,
            self.cfg,
            mel,
            jnp.asarray(frames, jnp.int32),
            jnp.asarray(prefix),
            jnp.asarray(suffix),
            jnp.asarray(suffix_len, jnp.int32),
            self.cache_k,
            self.cache_v,
            self.cache_len,
            self.last_tok,
            self.out_tokens,
            self.n_emitted,
            self.done,
            self.bias,
            self.budgets,
            jnp.asarray(slot_idx, jnp.int32),
        )

    def _dispatch_decode(self, k: int):
        (
            self.cache_k,
            self.cache_v,
            self.cache_len,
            self.last_tok,
            self.out_tokens,
            self.n_emitted,
            self.done,
            status,
        ) = _decode_k_program(
            self.transcriber.params,
            self.cfg,
            self.cache_k,
            self.cache_v,
            self.cache_len,
            self.last_tok,
            self.out_tokens,
            self.n_emitted,
            self.done,
            self.bias,
            self.budgets,
            k,
        )
        return status

    # ---------------- scheduler ----------------

    @property
    def _n_active(self) -> int:
        return sum(s.active for s in self.slots)

    async def _scheduler(self) -> None:
        loop = asyncio.get_running_loop()
        try:
            while self._running:
                did_work = False

                # 1) batched VAD (latency-critical, cheap)
                vad_batch = []
                while not self._vad_requests.empty():
                    vad_batch.append(self._vad_requests.get_nowait())
                if vad_batch:
                    await loop.run_in_executor(None, self._run_vad_batch, vad_batch)
                    did_work = True

                # 2) admit new requests into free slots (no host roundtrips)
                while not self._requests.empty() and self._n_active < self.S:
                    req = self._requests.get_nowait()
                    self._admit(req)  # pure dispatch, non-blocking
                    did_work = True

                # 3) one K-step decode for all active slots + ONE status fetch
                if self._n_active:
                    await loop.run_in_executor(None, self._decode_tick)
                    did_work = True

                self.stats["ticks"] += 1
                if not did_work:
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
            logger.exception("batcher scheduler crashed")
            for s in self.slots:
                if s.active and s.request and not s.request.future.done():
                    s.request.future.set_exception(RuntimeError("batcher crashed"))

    # ---------------- device work ----------------

    def _admit(self, req: _TranscribeReq) -> None:
        tr = self.transcriber
        slot_idx = next(i for i, s in enumerate(self.slots) if not s.active)
        try:
            x = tr.prepare_audio(req.audio, req.sample_rate)
            from sonicscribe_tpu.audio.mel import frame_count, log_mel_spectrogram

            frames = max(1, frame_count(int(x.shape[0]), tr.mel_cfg))
            bucket = tr._pick_bucket(frames)
            if frames > bucket:
                frames = bucket
                x = x[: bucket * tr.mel_cfg.hop_length]
            mel = log_mel_spectrogram(x, tr.mel_cfg, pad_to_frames=bucket)[None]
            if jax.tree.leaves(tr.params)[0].dtype == jnp.bfloat16:
                mel = mel.astype(jnp.bfloat16)

            prompt = build_prompt(tr.tokenizer, self.cfg, hotwords=req.hotwords)
            suffix = np.full((MAX_SUFFIX_TOKENS,), self.cfg.pad_id, np.int32)
            s_ids = prompt.suffix_ids[:MAX_SUFFIX_TOKENS]
            suffix[: len(s_ids)] = s_ids
            bias_row = np.asarray(tr._hotword_logit_bias(req.hotwords), np.float32)

            # per-slot bias/budget rows must land BEFORE the prefill program
            self.bias = self.bias.at[slot_idx].set(jnp.asarray(bias_row))
            self.budgets = self.budgets.at[slot_idx].set(req.max_new_tokens)
            self._dispatch_prefill(
                mel, frames, prompt.prefix_ids, suffix, len(s_ids), slot_idx
            )

            st = self.slots[slot_idx]
            st.request = req
            st.budget = req.max_new_tokens
            st.active = True
            st.steps_seen = 0
            self.stats["prefills"] += 1
        except Exception as e:
            logger.exception("admit failed")
            if not req.future.done():
                req.future.get_loop().call_soon_threadsafe(req.future.set_exception, e)

    def _decode_tick(self) -> None:
        # K = largest choice <= min remaining budget among active slots
        # (so short interim decodes aren't over-decoded, while long file
        # decodes amortize the ~27 ms status-fetch RTT over up to 64 steps)
        remaining = [
            max(1, s.budget - 1 - s.steps_seen) for s in self.slots if s.active
        ]
        # the device enforces exact budget/EOS stops; this only bounds waste
        min_rem = max(1, min(remaining)) if remaining else 1
        k = max(c for c in _DECODE_K_CHOICES if c <= max(min_rem, 1))

        status = np.asarray(self._dispatch_decode(k))  # ONE host fetch
        self.stats["decode_steps"] += k
        for s in self.slots:
            if s.active:
                s.steps_seen += k

        finished = [
            i
            for i, s in enumerate(self.slots)
            if s.active and status[i] < 0
        ]
        if finished:
            # fetch all finished rows in one transfer
            rows = np.asarray(self.out_tokens[jnp.asarray(finished)])
            for row, i in zip(rows, finished):
                self._finish(i, row, -int(status[i]) - 1)

    def _finish(self, slot_idx: int, row: np.ndarray, n_tokens: int) -> None:
        st = self.slots[slot_idx]
        req: _TranscribeReq = st.request
        out = []
        for t in row[:n_tokens]:
            t = int(t)
            if t in (self.cfg.eos_id, self.cfg.pad_id):
                break
            out.append(t)
        text = self.transcriber.tokenizer.decode(out)
        duration = len(req.audio) / req.sample_rate
        dt = time.perf_counter() - req.t_enqueue
        result = TranscribeResult(
            text=text,
            tokens=np.asarray(out, np.int32),
            audio_duration_s=duration,
            timings={"total_s": dt, "rtf": dt / max(duration, 1e-6)},
        )
        st.active = False
        st.request = None
        if not req.future.done():
            req.future.get_loop().call_soon_threadsafe(req.future.set_result, result)

    def _run_vad_batch(self, batch: list[_VadReq]) -> None:
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
            probs, new_states = self._vad_program(
                self.vad.params, jnp.asarray(windows), states
            )
            probs_host = np.asarray(probs)  # one fetch for the whole batch
            self.stats["vad_batches"] += 1
            for j, r in enumerate(batch):
                new_state_j = jax.tree.map(lambda x: x[j : j + 1], new_states)
                if not r.future.done():
                    r.future.get_loop().call_soon_threadsafe(
                        r.future.set_result, (float(probs_host[j]), new_state_j)
                    )
        except Exception as e:
            logger.exception("vad batch failed")
            for r in batch:
                if not r.future.done():
                    r.future.get_loop().call_soon_threadsafe(r.future.set_exception, e)
