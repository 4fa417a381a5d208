"""GLM-ASR-Nano audio LLM, implemented TPU-first in functional JAX.

Replaces the reference's HF `trust_remote_code` model + `model.generate`
(reference: backend/asr.py:66-146, 407-422) with:

- a Whisper-style audio encoder (2 convs with 2x time subsampling, sinusoidal
  positions, pre-LN transformer),
- the `audio_proj` adapter (frame stacking + 2-layer MLP),
- a GLM-style decoder-only LM (RMSNorm, partial RoPE, GQA w/ QKV bias, SwiGLU,
  tied embeddings),
- an explicit persistent KV cache with separate `prefill` / `decode_step`
  entry points so the continuous batcher can schedule them independently
  (the reference's generate loop is monolithic and blocks the event loop,
  SURVEY.md §3.3).

Design notes for TPU/XLA:
- layer parameters are STACKED on a leading axis and iterated with `lax.scan`
  -> one compiled layer body regardless of depth (fast compiles, small HLO);
- all shapes static; padding + length masks instead of dynamic shapes;
- params/activations bf16, softmax/layernorm/logits accumulated in f32 so
  greedy argmax is stable (token-exactness mitigation, SURVEY.md §7);
- cache updates are donated in the engine's jitted wrappers (no copies).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonicscribe_tpu.models.config import AudioEncoderConfig, DecoderConfig, GlmAsrConfig
from sonicscribe_tpu.ops.quant import matmul, matmul_w8a8

Params = Dict[str, Any]
Cache = Dict[str, jnp.ndarray]

NEG_INF = -1e30


# =====================================================================
# Initialization
# =====================================================================


def _dense_init(key, shape, dtype=jnp.bfloat16, scale: float = 0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_params(cfg: GlmAsrConfig, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    enc, dec = cfg.encoder, cfg.decoder
    keys = iter(jax.random.split(key, 64))

    d = enc.d_model
    encoder = {
        "conv1": {
            "w": _dense_init(next(keys), (3, enc.n_mels, d), dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "conv2": {
            "w": _dense_init(next(keys), (3, d, d), dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "layers": {
            "ln1_scale": jnp.ones((enc.n_layers, d), dtype),
            "ln1_bias": jnp.zeros((enc.n_layers, d), dtype),
            "q_w": _dense_init(next(keys), (enc.n_layers, d, d), dtype),
            "q_b": jnp.zeros((enc.n_layers, d), dtype),
            "k_w": _dense_init(next(keys), (enc.n_layers, d, d), dtype),
            "v_w": _dense_init(next(keys), (enc.n_layers, d, d), dtype),
            "v_b": jnp.zeros((enc.n_layers, d), dtype),
            "o_w": _dense_init(next(keys), (enc.n_layers, d, d), dtype),
            "o_b": jnp.zeros((enc.n_layers, d), dtype),
            "ln2_scale": jnp.ones((enc.n_layers, d), dtype),
            "ln2_bias": jnp.zeros((enc.n_layers, d), dtype),
            "fc1_w": _dense_init(next(keys), (enc.n_layers, d, enc.ffn_mult * d), dtype),
            "fc1_b": jnp.zeros((enc.n_layers, enc.ffn_mult * d), dtype),
            "fc2_w": _dense_init(next(keys), (enc.n_layers, enc.ffn_mult * d, d), dtype),
            "fc2_b": jnp.zeros((enc.n_layers, d), dtype),
        },
        "ln_post_scale": jnp.ones((d,), dtype),
        "ln_post_bias": jnp.zeros((d,), dtype),
    }

    stack_in = cfg.adapter_stack * d
    adapter = {
        "fc1": {
            "w": _dense_init(next(keys), (stack_in, cfg.adapter_hidden), dtype),
            "b": jnp.zeros((cfg.adapter_hidden,), dtype),
        },
        "fc2": {
            "w": _dense_init(next(keys), (cfg.adapter_hidden, dec.d_model), dtype),
            "b": jnp.zeros((dec.d_model,), dtype),
        },
    }

    dd = dec.d_model
    qkv_out = (dec.n_heads + 2 * dec.n_kv_heads) * dec.head_dim
    decoder = {
        "embed": _dense_init(next(keys), (dec.vocab_size, dd), dtype),
        "layers": {
            "ln1_scale": jnp.ones((dec.n_layers, dd), dtype),
            "qkv_w": _dense_init(next(keys), (dec.n_layers, dd, qkv_out), dtype),
            "qkv_b": jnp.zeros((dec.n_layers, qkv_out), dtype),
            "o_w": _dense_init(
                next(keys), (dec.n_layers, dec.n_heads * dec.head_dim, dd), dtype
            ),
            "ln2_scale": jnp.ones((dec.n_layers, dd), dtype),
            "gate_up_w": _dense_init(
                next(keys), (dec.n_layers, dd, 2 * dec.ffn_hidden), dtype
            ),
            "down_w": _dense_init(next(keys), (dec.n_layers, dec.ffn_hidden, dd), dtype),
        },
        "ln_f_scale": jnp.ones((dd,), dtype),
    }
    if not dec.tie_embeddings:
        decoder["lm_head"] = _dense_init(next(keys), (dd, dec.vocab_size), dtype)

    return {"encoder": encoder, "adapter": adapter, "decoder": decoder}


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# =====================================================================
# Shared primitives
# =====================================================================


def _layer_norm(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _rms_norm(x, scale, eps):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper-style fixed sinusoidal positions [length, channels]."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def _rope_tables(cfg: DecoderConfig, positions: jnp.ndarray):
    """cos/sin tables for positions; rotary over the first
    `head_dim * partial_rotary_factor` dims, NeoX half-split convention."""
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, rot, 2, dtype=jnp.float32) / rot)
    )
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., rot//2]
    return jnp.cos(ang), jnp.sin(ang), rot


def _apply_rope(x, cos, sin, rot):
    """x: [..., H, head_dim]; cos/sin: [..., rot//2] broadcast over heads."""
    x1 = x[..., : rot // 2].astype(jnp.float32)
    x2 = x[..., rot // 2 : rot].astype(jnp.float32)
    c = cos[..., None, :]
    s = sin[..., None, :]
    out1 = x1 * c - x2 * s
    out2 = x2 * c + x1 * s
    return jnp.concatenate(
        [out1.astype(x.dtype), out2.astype(x.dtype), x[..., rot:]], axis=-1
    )


# =====================================================================
# Audio encoder + adapter
# =====================================================================


def _conv1d(x, w, b, stride: int):
    """x: [B, T, C_in], w: [K, C_in, C_out] -> [B, T', C_out], SAME padding."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)).astype(x.dtype)


def _encoder_block(x, mask_bias, lp, n_heads: int):
    """One pre-LN transformer block. x: [B, S, D]; mask_bias: [B, 1, 1, S]."""
    B, S, D = x.shape
    hd = D // n_heads

    h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
    q = (matmul(h, lp["q_w"]) + lp["q_b"]).reshape(B, S, n_heads, hd)
    k = matmul(h, lp["k_w"]).reshape(B, S, n_heads, hd)
    v = (matmul(h, lp["v_w"]) + lp["v_b"]).reshape(B, S, n_heads, hd)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / math.sqrt(hd)) + mask_bias
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, S, D)
    x = x + matmul(ctx, lp["o_w"]) + lp["o_b"]

    h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
    h = jax.nn.gelu(matmul(h, lp["fc1_w"]) + lp["fc1_b"], approximate=False)
    return x + matmul(h, lp["fc2_w"]) + lp["fc2_b"]


def encode_audio(
    params: Params,
    cfg: GlmAsrConfig,
    mel: jnp.ndarray,  # [B, T, n_mels], zero-padded
    n_frames: jnp.ndarray,  # [B] true frame counts
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (audio_embeds [B, T // frames_per_audio_token, d_lm], n_tokens [B])."""
    enc = cfg.encoder
    p = params["encoder"]
    B, T, _ = mel.shape

    x = jax.nn.gelu(_conv1d(mel, p["conv1"]["w"], p["conv1"]["b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, p["conv2"]["w"], p["conv2"]["b"], 2), approximate=False)
    S = x.shape[1]  # T // 2

    pos = jnp.asarray(_sinusoids(S, enc.d_model), x.dtype)
    x = x + pos[None]

    # padding mask over subsampled frames
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        < (jnp.ceil(n_frames / 2)).astype(jnp.int32)[:, None]
    )
    mask_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    def body(h, lp):
        return _encoder_block(h, mask_bias, lp, enc.n_heads), None

    x, _ = jax.lax.scan(body, x, p["layers"])
    x = _layer_norm(x, p["ln_post_scale"], p["ln_post_bias"])
    x = jnp.where(valid[..., None], x, 0)

    # adapter ("audio_proj"): stack k frames -> MLP -> LM space
    k = cfg.adapter_stack
    S_out = S // k
    x = x[:, : S_out * k].reshape(B, S_out, k * enc.d_model)
    a = params["adapter"]
    x = jax.nn.gelu(x @ a["fc1"]["w"] + a["fc1"]["b"], approximate=False)
    x = x @ a["fc2"]["w"] + a["fc2"]["b"]

    n_tokens = jnp.maximum(n_frames // cfg.frames_per_audio_token, 1)
    return x, n_tokens.astype(jnp.int32)


# =====================================================================
# Decoder: KV cache, prefill, decode step
# =====================================================================


def init_cache(
    cfg: GlmAsrConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> Cache:
    dec = cfg.decoder
    shape = (dec.n_layers, batch, max_len, dec.n_kv_heads, dec.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "len": jnp.zeros((batch,), jnp.int32),
    }


def embed_tokens(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    return params["decoder"]["embed"][tokens]


def _decode_mm(dec: DecoderConfig):
    """The matmul the decode/verify programs use for the four decoder
    projections: the W8A16 convert-dot by default, the native-s8 W8A8 dot
    when cfg selects it (quant mode "int8-decoder-a8"). Resolved at trace
    time — dec is static in every jitted program."""
    return matmul_w8a8 if dec.act_int8_decode else matmul


def _decoder_qkv(lp, h, dec: DecoderConfig, mm=matmul):
    B = h.shape[0]
    lead = h.shape[:-1]
    qkv = mm(h, lp["qkv_w"])
    if dec.qkv_bias:
        qkv = qkv + lp["qkv_b"]
    nq = dec.n_heads * dec.head_dim
    nkv = dec.n_kv_heads * dec.head_dim
    q = qkv[..., :nq].reshape(*lead, dec.n_heads, dec.head_dim)
    k = qkv[..., nq : nq + nkv].reshape(*lead, dec.n_kv_heads, dec.head_dim)
    v = qkv[..., nq + nkv :].reshape(*lead, dec.n_kv_heads, dec.head_dim)
    del B
    return q, k, v


def _gqa_scores(q, k):
    """q: [B, Sq, nh, hd], k: [B, Sk, nkv, hd] -> scores [B, nkv, g, Sq, Sk] f32."""
    B, Sq, nh, hd = q.shape
    nkv = k.shape[2]
    g = nh // nkv
    qg = q.reshape(B, Sq, nkv, g, hd)
    return jnp.einsum("bqkgd,bskd->bkgqs", qg, k, preferred_element_type=jnp.float32)


def _gqa_context(attn, v):
    """attn: [B, nkv, g, Sq, Sk] (dtype of v), v: [B, Sk, nkv, hd] -> [B, Sq, nh*hd]."""
    B, nkv, g, Sq, _ = attn.shape
    hd = v.shape[-1]
    ctx = jnp.einsum("bkgqs,bskd->bqkgd", attn, v)
    return ctx.reshape(B, Sq, nkv * g * hd)


def _decoder_layer_mlp(h, lp, dec: DecoderConfig, mm=matmul):
    """Post-attention half of every decoder layer (shared by prefill,
    decode_step, and decode_step_dual so fixes can't diverge)."""
    hn = _rms_norm(h, lp["ln2_scale"], dec.rms_eps)
    gate, up = jnp.split(mm(hn, lp["gate_up_w"]), 2, axis=-1)
    return h + mm(jax.nn.silu(gate) * up, lp["down_w"])


def _decode_qkv_rope(lp, hn, dec: DecoderConfig, cos, sin, rot, mm=matmul):
    """Single-position QKV + RoPE (decode_step / decode_step_dual).
    hn: [B, D] -> q [B, nh, hd], k_new/v_new [B, nkv, hd]."""
    q, k_new, v_new = _decoder_qkv(lp, hn, dec, mm=mm)
    q = _apply_rope(q[:, None], cos[:, None], sin[:, None], rot)[:, 0]
    k_new = _apply_rope(k_new[:, None], cos[:, None], sin[:, None], rot)[:, 0]
    return q, k_new, v_new


def _masked_decode_attention(q, k_cache, v_cache, valid, dec: DecoderConfig):
    """Single-position GQA attention against a padded cache.
    q: [B, nh, hd]; k/v_cache: [B, M, nkv, hd]; valid: [B, M] bool
    -> ctx [B, nh*hd] in q's dtype."""
    B = q.shape[0]
    nkv, g = dec.n_kv_heads, dec.n_heads // dec.n_kv_heads
    qg = q.reshape(B, nkv, g, dec.head_dim)
    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k_cache, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(dec.head_dim))
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bkgs,bskd->bkgd", attn, v_cache).reshape(
        B, dec.n_heads * dec.head_dim
    )


def _decoder_layer_prefill(x, lp, dec: DecoderConfig, cos, sin, rot, mask_bias):
    """x: [B, S, D]; returns (x', (k_layer, v_layer)) for cache storage."""
    h = _rms_norm(x, lp["ln1_scale"], dec.rms_eps)
    q, k, v = _decoder_qkv(lp, h, dec)
    q = _apply_rope(q, cos, sin, rot)
    k = _apply_rope(k, cos, sin, rot)

    scores = _gqa_scores(q, k) * (1.0 / math.sqrt(dec.head_dim))
    scores = scores + mask_bias  # [B, 1, 1, S, S] broadcast
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = _gqa_context(attn, v)
    x = x + matmul(ctx, lp["o_w"])
    return _decoder_layer_mlp(x, lp, dec), (k, v)


def _lm_logits(params: Params, cfg: GlmAsrConfig, h: jnp.ndarray) -> jnp.ndarray:
    dec = cfg.decoder
    h = _rms_norm(h, params["decoder"]["ln_f_scale"], dec.rms_eps)
    if dec.tie_embeddings:
        w = params["decoder"]["embed"].T
    else:
        w = params["decoder"]["lm_head"]
    return jnp.einsum("...d,dv->...v", h, w, preferred_element_type=jnp.float32)


def prefill_kv(
    params: Params,
    cfg: GlmAsrConfig,
    embeds: jnp.ndarray,  # [B, S, D] zero-padded prompt embeddings
    length: jnp.ndarray,  # [B] true prompt lengths
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the prompt through the decoder WITHOUT a cache object.

    Returns (ks, vs, last_logits): ks/vs are [L, B, S, nkv, hd] for the caller
    to place into its cache (the continuous batcher writes them into a session
    slot); last_logits [B, V] f32 is taken at each row's final real position.
    """
    dec = cfg.decoder
    B, S, _ = embeds.shape
    positions = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    cos, sin, rot = _rope_tables(dec, positions)

    # causal AND within true length
    q_pos = positions[:, None, None, :, None]
    k_pos = positions[:, None, None, None, :]
    causal = k_pos <= q_pos
    in_len = k_pos < length[:, None, None, None, None]
    mask_bias = jnp.where(causal & in_len, 0.0, NEG_INF).astype(jnp.float32)

    def body(h, lp):
        h, kv = _decoder_layer_prefill(h, lp, dec, cos, sin, rot, mask_bias)
        return h, kv

    h, (ks, vs) = jax.lax.scan(body, embeds, params["decoder"]["layers"])
    last_idx = jnp.maximum(length - 1, 0)
    h_last = jnp.take_along_axis(h, last_idx[:, None, None], axis=1)[:, 0]
    return ks, vs, _lm_logits(params, cfg, h_last)


def prefill(
    params: Params,
    cfg: GlmAsrConfig,
    embeds: jnp.ndarray,  # [B, S, D] zero-padded prompt embeddings
    length: jnp.ndarray,  # [B] true prompt lengths
    cache: Cache,
) -> Tuple[Cache, jnp.ndarray]:
    """Run the prompt through the decoder, filling cache[:, :, :S].

    Returns (cache, last_logits [B, V]) — see prefill_kv.
    """
    B, S, _ = embeds.shape
    max_len = cache["k"].shape[2]
    if max_len - S < 0:
        raise ValueError(f"prompt length {S} exceeds cache capacity {max_len}")
    ks, vs, last_logits = prefill_kv(params, cfg, embeds, length)
    cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], ks.astype(cache["k"].dtype), (0, 0, 0, 0, 0)
        ),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], vs.astype(cache["v"].dtype), (0, 0, 0, 0, 0)
        ),
        "len": length.astype(jnp.int32),
    }
    return cache, last_logits


def decode_step(
    params: Params,
    cfg: GlmAsrConfig,
    cache: Cache,
    tokens: jnp.ndarray,  # [B] int32 current input tokens
    active: jnp.ndarray | None = None,  # [B] bool; inactive rows don't advance
    use_flash: bool = False,
    kv_write_in_scan: bool = True,
    unroll: int = 1,
) -> Tuple[Cache, jnp.ndarray]:
    """One autoregressive step for the whole decode batch. Returns f32 logits.

    KV-write placement (measured A/B on the real v5e, DECODE_STEP_BENCH.json
    via tools/bench_decode.py): the default scatters the current token into
    the cache INSIDE the layer scan and re-emits the cache as ys — XLA
    aliases the xs->ys buffers in place, so this does NOT rewrite the padded
    cache to HBM and measures ~5% faster than the alternative
    (`kv_write_in_scan=False`), which keeps the caches read-only inside the
    scan, folds the current token into attention as an explicit extra score
    column, and scatters the new rows [L, B, nkv, hd] once after the scan.
    Both forms are token-identical; the flag exists for re-benchmarking on
    new hardware/XLA versions.

    use_flash=True routes attention through the Pallas flash-decode kernel
    (ops/decode_attention.py): only the occupied KV blocks are read from HBM
    instead of the whole padded cache. Requires max_len % 128 == 0; implies
    the in-scan write (the kernel reads the current token from the cache).
    """
    dec = cfg.decoder
    B = tokens.shape[0]
    max_len = cache["k"].shape[2]
    pos = cache["len"]  # [B] position to write
    if active is None:
        active = jnp.ones((B,), bool)
    if use_flash and max_len % 128 != 0:
        raise ValueError(
            f"flash decode needs cache max_len % 128 == 0, got {max_len}"
        )
    # interpret mode lets the same code path run on CPU (tests/dev)
    flash_interpret = jax.default_backend() != "tpu"

    x = embed_tokens(params, tokens)  # [B, D]
    cos, sin, rot = _rope_tables(dec, pos)  # [B, rot//2]

    # key-validity mask: slots < len are valid history; the new token at `pos`
    # is folded in explicitly below.
    kpos = jax.lax.broadcasted_iota(jnp.int32, (B, max_len), 1)
    hist_valid = kpos < pos[:, None]

    batch_idx = jnp.arange(B)
    nkv, g = dec.n_kv_heads, dec.n_heads // dec.n_kv_heads
    scale = 1.0 / math.sqrt(dec.head_dim)

    mm = _decode_mm(dec)

    def body(h, layer):
        lp, k_cache, v_cache = layer
        hn = _rms_norm(h, lp["ln1_scale"], dec.rms_eps)
        q, k_new, v_new = _decode_qkv_rope(lp, hn, dec, cos, sin, rot, mm=mm)
        # match the numerics of reading the stored (cache-dtype) K/V back
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)

        if use_flash or kv_write_in_scan:
            k_cache = k_cache.at[batch_idx, pos].set(k_new, mode="drop")
            v_cache = v_cache.at[batch_idx, pos].set(v_new, mode="drop")

        if use_flash:
            from sonicscribe_tpu.ops.decode_attention import (
                flash_decode_attention,
            )

            ctx = flash_decode_attention(
                q, k_cache, v_cache, pos, interpret=flash_interpret
            ).astype(h.dtype)
        elif kv_write_in_scan:  # current token is in the cache
            ctx = _masked_decode_attention(
                q, k_cache, v_cache, hist_valid | (kpos == pos[:, None]), dec
            )
        else:  # read-only cache: fold the current token in explicitly
            qg = q.reshape(B, nkv, g, dec.head_dim)
            scores = jnp.einsum(
                "bkgd,bskd->bkgs", qg, k_cache, preferred_element_type=jnp.float32
            ) * scale
            scores = jnp.where(
                hist_valid[:, None, None, :], scores, NEG_INF
            )
            score_new = jnp.einsum(
                "bkgd,bkd->bkg", qg, k_new,
                preferred_element_type=jnp.float32,
            )[..., None] * scale  # [B, nkv, g, 1]
            # full cache (pos == max_len): the in-scan form's write is
            # dropped and the token never attended — match that here
            score_new = jnp.where(
                (pos < max_len)[:, None, None, None], score_new, NEG_INF
            )
            scores = jnp.concatenate([scores, score_new], axis=-1)
            attn = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
            ctx = (
                jnp.einsum("bkgs,bskd->bkgd", attn[..., :max_len], v_cache)
                + attn[..., max_len:] * v_new[:, :, None, :]
            ).reshape(B, dec.n_heads * dec.head_dim)
        h = h + mm(ctx, lp["o_w"])
        h = _decoder_layer_mlp(h, lp, dec, mm=mm)
        if use_flash or kv_write_in_scan:
            return h, (k_cache, v_cache)
        return h, (k_new, v_new)

    h, (k_out, v_out) = jax.lax.scan(
        body, x, (params["decoder"]["layers"], cache["k"], cache["v"]),
        unroll=unroll,
    )
    if use_flash or kv_write_in_scan:
        cache_k, cache_v = k_out, v_out  # full caches re-emitted by the scan
    else:
        # one small scatter of the new rows [L, B, nkv, hd] into the caches
        cache_k = cache["k"].at[:, batch_idx, pos].set(k_out, mode="drop")
        cache_v = cache["v"].at[:, batch_idx, pos].set(v_out, mode="drop")
    new_len = jnp.where(active, jnp.minimum(pos + 1, max_len), pos)
    cache = {"k": cache_k, "v": cache_v, "len": new_len}
    return cache, _lm_logits(params, cfg, h)


def verify_step(
    params: Params,
    cfg: GlmAsrConfig,
    cache: Cache,
    tokens: jnp.ndarray,  # [B, W1] int32: x_0 (last emitted) + W draft tokens
    active: jnp.ndarray | None = None,  # [B] bool; inactive rows' len is the
    # caller's concern (verify never advances len itself)
) -> Tuple[Cache, jnp.ndarray]:
    """One speculative VERIFICATION step: W1 query positions per slot in a
    single forward pass (one weights-read emits up to W1 greedy tokens).

    logits[:, j] is the next-token distribution after x_0..x_j — i.e. the
    greedy token the sequential decode_step would produce at that point.
    K/V for ALL W1 inputs are written at positions len..len+W1-1 (mode=
    "drop" past max_len); entries beyond the caller's accepted prefix are
    garbage above the returned `len` and get overwritten by later rounds,
    exactly like decode_step's frozen-slot writes. `cache["len"]` is
    returned UNCHANGED — the caller advances it by its accepted count.

    Numerics match decode_step's in-scan form token-for-token: the same
    QKV/RoPE helpers at the same positions, k/v cast to the cache dtype
    BEFORE attention, and query j attends cache positions <= len+j (its
    own just-written K plus this round's earlier inputs plus history) —
    the identical key set the sequential path would have stored. The TPU
    cost model: decode is HBM-bound (weights + KV read per step), so W1
    queries cost the same bandwidth as one decode_step; only the (cheap,
    MXU-friendly) projection/MLP FLOPs scale with W1.

    Drives the speculative-finals path (engine/batcher.py
    _verify_rounds_program); no reference counterpart — the reference
    decodes finals token-by-token (backend/asr.py:407-422).
    """
    dec = cfg.decoder
    B, W1 = tokens.shape
    max_len = cache["k"].shape[2]
    pos0 = cache["len"]  # [B]
    if active is None:
        active = jnp.ones((B,), bool)

    qpos = pos0[:, None] + jnp.arange(W1, dtype=pos0.dtype)[None, :]  # [B, W1]
    x = embed_tokens(params, tokens)  # [B, W1, D]
    cos, sin, rot = _rope_tables(dec, qpos)  # [B, W1, rot//2]

    kpos = jnp.arange(max_len, dtype=jnp.int32)
    # query j may attend every position <= len+j (history + this round's
    # inputs up to and including itself)
    valid = kpos[None, None, :] <= qpos[:, :, None]  # [B, W1, M]

    b_idx = jnp.arange(B)
    scale = 1.0 / math.sqrt(dec.head_dim)

    mm = _decode_mm(dec)

    def body(h, layer):
        lp, k_cache, v_cache = layer
        hn = _rms_norm(h, lp["ln1_scale"], dec.rms_eps)
        q, k_new, v_new = _decoder_qkv(lp, hn, dec, mm=mm)  # [B, W1, nh/nkv, hd]
        q = _apply_rope(q, cos, sin, rot)
        k_new = _apply_rope(k_new, cos, sin, rot).astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)
        k_cache = k_cache.at[b_idx[:, None], qpos].set(k_new, mode="drop")
        v_cache = v_cache.at[b_idx[:, None], qpos].set(v_new, mode="drop")
        scores = _gqa_scores(q, k_cache) * scale  # [B, nkv, g, W1, M]
        scores = jnp.where(valid[:, None, None, :, :], scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
        ctx = _gqa_context(attn, v_cache)  # [B, W1, nh*hd]
        h = h + mm(ctx, lp["o_w"])
        h = _decoder_layer_mlp(h, lp, dec, mm=mm)
        return h, (k_cache, v_cache)

    h, (cache_k, cache_v) = jax.lax.scan(
        body, x, (params["decoder"]["layers"], cache["k"], cache["v"])
    )
    del active  # len advance (and thus frozen-row semantics) is caller-side
    cache = {"k": cache_k, "v": cache_v, "len": pos0}
    return cache, _lm_logits(params, cfg, h)


def decode_step_dual(
    params: Params,
    cfg: GlmAsrConfig,
    cache_a: Cache,
    tokens_a: jnp.ndarray,  # [Ba] int32
    cache_b: Cache,
    tokens_b: jnp.ndarray,  # [Bb] int32
    active_a: jnp.ndarray | None = None,
    active_b: jnp.ndarray | None = None,
) -> Tuple[Cache, jnp.ndarray, Cache, jnp.ndarray]:
    """One autoregressive step for TWO decode batches with DIFFERENT cache
    shapes in ONE program, streaming the layer weights from HBM once.

    Motivation: the continuous batcher keeps two KV pools (short/interim and
    long/final — engine/batcher.py); decode is weight-bandwidth-bound at
    serving batch sizes (~3.4 GB/step for nano bf16, DECODE_STEP_BENCH.json),
    so dispatching the pools as separate programs doubles the dominant HBM
    term whenever both classes are active — which under realtime load is most
    ticks. Here every row-independent op (RMSNorm, QKV/O/MLP projections,
    lm_head) runs on the CONCATENATED [Ba+Bb] batch; only attention splits,
    each half reading its own cache. Numerics per row are identical to
    decode_step (same op shapes row-wise; verified in tests/test_model.py).

    Returns (cache_a, logits_a, cache_b, logits_b); logits f32.
    """
    dec = cfg.decoder
    Ba, Bb = tokens_a.shape[0], tokens_b.shape[0]
    pos_a, pos_b = cache_a["len"], cache_b["len"]
    if active_a is None:
        active_a = jnp.ones((Ba,), bool)
    if active_b is None:
        active_b = jnp.ones((Bb,), bool)

    x = embed_tokens(params, jnp.concatenate([tokens_a, tokens_b]))  # [B, D]
    pos_all = jnp.concatenate([pos_a, pos_b])
    cos, sin, rot = _rope_tables(dec, pos_all)

    max_a, max_b = cache_a["k"].shape[2], cache_b["k"].shape[2]
    kpos_a = jax.lax.broadcasted_iota(jnp.int32, (Ba, max_a), 1)
    kpos_b = jax.lax.broadcasted_iota(jnp.int32, (Bb, max_b), 1)
    valid_a = kpos_a <= pos_a[:, None]  # history + the just-written token
    valid_b = kpos_b <= pos_b[:, None]
    idx_a, idx_b = jnp.arange(Ba), jnp.arange(Bb)

    mm = _decode_mm(dec)

    def body(h, layer):
        lp, ka, va, kb, vb = layer
        hn = _rms_norm(h, lp["ln1_scale"], dec.rms_eps)
        q, k_new, v_new = _decode_qkv_rope(lp, hn, dec, cos, sin, rot, mm=mm)

        ka = ka.at[idx_a, pos_a].set(k_new[:Ba].astype(ka.dtype), mode="drop")
        va = va.at[idx_a, pos_a].set(v_new[:Ba].astype(va.dtype), mode="drop")
        kb = kb.at[idx_b, pos_b].set(k_new[Ba:].astype(kb.dtype), mode="drop")
        vb = vb.at[idx_b, pos_b].set(v_new[Ba:].astype(vb.dtype), mode="drop")

        ctx = jnp.concatenate(
            [
                _masked_decode_attention(q[:Ba], ka, va, valid_a, dec),
                _masked_decode_attention(q[Ba:], kb, vb, valid_b, dec),
            ]
        )
        h = h + mm(ctx, lp["o_w"])
        h = _decoder_layer_mlp(h, lp, dec, mm=mm)
        return h, (ka, va, kb, vb)

    h, (ka, va, kb, vb) = jax.lax.scan(
        body,
        x,
        (
            params["decoder"]["layers"],
            cache_a["k"], cache_a["v"], cache_b["k"], cache_b["v"],
        ),
    )
    logits = _lm_logits(params, cfg, h)
    new_a = {
        "k": ka, "v": va,
        "len": jnp.where(active_a, jnp.minimum(pos_a + 1, max_a), pos_a),
    }
    new_b = {
        "k": kb, "v": vb,
        "len": jnp.where(active_b, jnp.minimum(pos_b + 1, max_b), pos_b),
    }
    return new_a, logits[:Ba], new_b, logits[Ba:]


# =====================================================================
# Convenience: whole-prompt greedy generation (file path / tests)
# =====================================================================


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def greedy_generate(
    params: Params,
    cfg: GlmAsrConfig,
    embeds: jnp.ndarray,  # [B, S, D]
    length: jnp.ndarray,  # [B]
    max_new_tokens: int,
    logit_bias: jnp.ndarray | None = None,  # [V] additive bias (hotwords)
) -> jnp.ndarray:
    """Greedy decode (do_sample=False parity, reference asr.py:414). Returns
    [B, max_new_tokens] tokens, pad-filled after EOS."""
    B, S, _ = embeds.shape
    cache = init_cache(cfg, B, S + max_new_tokens, dtype=embeds.dtype)
    cache, logits = prefill(params, cfg, embeds, length, cache)

    def pick(logits, done):
        if logit_bias is not None:
            logits = logits + logit_bias
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jnp.where(done, cfg.pad_id, tok)

    tok0 = pick(logits, jnp.zeros((B,), bool))

    def step(carry, _):
        cache, tok, done = carry
        done = done | (tok == cfg.eos_id)
        cache, logits = decode_step(params, cfg, cache, tok, active=~done)
        nxt = pick(logits, done)
        return (cache, nxt, done), tok

    (_, _, _), toks = jax.lax.scan(
        step, (cache, tok0, jnp.zeros((B,), bool)), None, length=max_new_tokens
    )
    return jnp.moveaxis(toks, 0, 1)  # [B, max_new]
