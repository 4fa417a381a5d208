"""Serialized-executable store (engine/exec_store.py): a restarted
engine must load stored binaries instead of recompiling, with token
parity; corrupt/stale entries must fall back to the compile path."""

import asyncio
import os

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


def _audio(seconds=0.4, f=300.0):
    t = np.arange(int(SR * seconds)) / SR
    return (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.fixture(scope="module")
def stack():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64,))
    return cfg, tr


def _transcribe(tr, cache_dir):
    os.environ["SONIC_EXEC_CACHE"] = cache_dir

    async def go():
        eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=16)
        try:
            r = await eng.transcribe(_audio(), SR, max_new_tokens=8)
            return r.tokens, eng._exec_store, dict(eng._execs)
        finally:
            eng.shutdown()

    loop = asyncio.get_event_loop_policy().new_event_loop()
    try:
        return loop.run_until_complete(go())
    finally:
        loop.close()
        os.environ["SONIC_EXEC_CACHE"] = "0"


def test_store_roundtrip_and_parity(stack, tmp_path):
    cfg, tr = stack
    golden = tr.transcribe(_audio(), SR, max_new_tokens=8).tokens

    # first boot: compiles + saves
    tokens_a, store_a, execs_a = _transcribe(tr, str(tmp_path))
    np.testing.assert_array_equal(tokens_a, golden)
    assert store_a is not None and store_a.saves > 0
    assert len(os.listdir(store_a.dir)) == store_a.saves

    # restart: every dispatched program loads from the store, none compile
    tokens_b, store_b, execs_b = _transcribe(tr, str(tmp_path))
    np.testing.assert_array_equal(tokens_b, golden)
    assert store_b.dir == store_a.dir  # fingerprint is stable
    assert store_b.loads == len(execs_b)  # all hits
    assert store_b.saves == 0


def test_corrupt_entry_falls_back(stack, tmp_path):
    cfg, tr = stack
    tokens_a, store_a, _ = _transcribe(tr, str(tmp_path))
    for name in os.listdir(store_a.dir):
        with open(os.path.join(store_a.dir, name), "wb") as fh:
            fh.write(b"not a pickle")
    tokens_b, store_b, _ = _transcribe(tr, str(tmp_path))
    np.testing.assert_array_equal(tokens_b, tokens_a)
    assert store_b.loads == 0 and store_b.saves > 0  # recompiled + re-saved


def test_transcriber_roundtrip(stack, tmp_path):
    """Transcriber routes its (bucket, budget) program through the store:
    restart loads, token parity holds."""
    cfg, tr0 = stack
    audio = _audio()
    golden = tr0.transcribe(audio, SR, max_new_tokens=8).tokens

    os.environ["SONIC_EXEC_CACHE"] = str(tmp_path)
    try:
        tr1 = Transcriber(
            cfg, tr0.params, tr0.tokenizer, prefill_buckets=(64,)
        )
        t1 = tr1.transcribe(audio, SR, max_new_tokens=8).tokens
        np.testing.assert_array_equal(t1, golden)
        assert tr1._router.store is not None and tr1._router.store.saves == 1

        tr2 = Transcriber(
            cfg, tr0.params, tr0.tokenizer, prefill_buckets=(64,)
        )
        t2 = tr2.transcribe(audio, SR, max_new_tokens=8).tokens
        np.testing.assert_array_equal(t2, golden)
        assert tr2._router.store.loads == 1 and tr2._router.store.saves == 0
    finally:
        os.environ["SONIC_EXEC_CACHE"] = "0"


def test_fused_slot_writes_gate_on_registration(stack, tmp_path):
    """With an exec store present, the fused admit-state write dispatches
    only once its ('slot_write', pool, B) key is registered — warmup
    registers the whole (pool, B) ladder in its blocking pass; a group
    admitted before that routes through the eager writes (behavior-
    identical), so admission never JITs a new program mid-serving."""
    cfg, tr = stack
    golden = tr.transcribe(_audio(), SR, max_new_tokens=8).tokens
    os.environ["SONIC_EXEC_CACHE"] = str(tmp_path)
    try:
        eng = BatchedEngine(tr, EnergyVad(), slots=2, max_decode_tokens=16)
        assert eng.fuse_slot_writes and eng._router.store is not None

        async def go():
            return await eng.transcribe(_audio(), SR, max_new_tokens=8)

        loop = asyncio.get_event_loop_policy().new_event_loop()
        try:
            r1 = loop.run_until_complete(go())
            np.testing.assert_array_equal(r1.tokens, golden)
            # unwarmed: the admit routed eager — no fused key compiled
            assert not any(
                k[0] == "slot_write" for k in eng._router.execs
            ), "unregistered fused write must fall back to eager"
            eng.warmup(fast=True)
            keys = {k for k in eng._router.execs if k[0] == "slot_write"}
            assert {k[1] for k in keys} == {"short", "long"}, (
                "warmup must pre-register the fused-write ladder for "
                "both pools"
            )
            r2 = loop.run_until_complete(go())  # now takes the fused path
            np.testing.assert_array_equal(r2.tokens, golden)
        finally:
            loop.close()
            eng.shutdown()
    finally:
        os.environ["SONIC_EXEC_CACHE"] = "0"


def test_prune_drops_only_stale_dirs(tmp_path):
    """Old fingerprint dirs prune; fresh ones (concurrent engines) stay."""
    from sonicscribe_tpu.engine.exec_store import ExecStore

    old = [tmp_path / f"stale{i}" for i in range(9)]
    for d in old:
        d.mkdir()
        os.utime(d, (1, 1))  # ancient mtime
    fresh = tmp_path / "fresh"
    fresh.mkdir()  # now-mtime: younger than min_age_s, must survive
    store = ExecStore(str(tmp_path), context=("prune-test",))
    left = {p.name for p in tmp_path.iterdir() if p.is_dir()}
    assert "fresh" in left
    # 10 sibling dirs, keep=8 -> the 3 oldest beyond keep-1 are pruned
    assert sum(n.startswith("stale") for n in left) == 6
    assert os.path.basename(store.dir) in left


def test_fingerprint_separates_configs(stack, tmp_path):
    """A different engine shape must not reuse another context's dir."""
    cfg, tr = stack
    _, store_a, _ = _transcribe(tr, str(tmp_path))
    os.environ["SONIC_EXEC_CACHE"] = str(tmp_path)
    try:
        eng = BatchedEngine(tr, EnergyVad(), slots=3, max_decode_tokens=16)
        assert eng._exec_store is not None
        assert eng._exec_store.dir != store_a.dir
        eng.shutdown()
    finally:
        os.environ["SONIC_EXEC_CACHE"] = "0"
