"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicscribe_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_params,
    shard_batch,
    shard_params_tp,
)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")


def test_mesh_axes(devices_ok):
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_replicated_params_on_all_devices(devices_ok):
    mesh = make_mesh(8)
    params = {"w": jnp.ones((16, 16)), "b": jnp.zeros((16,))}
    rep = replicate_params(params, mesh)
    assert len(rep["w"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(rep["w"]), np.ones((16, 16)))


def test_sharded_batch_computation(devices_ok):
    """A data-sharded batch computation must produce identical results to the
    single-device computation (GSPMD correctness, not just placement)."""
    mesh = make_mesh(8)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    w = jnp.ones((4, 4))
    xs = jax.device_put(x, batch_sharding(mesh, 2, axis=0))
    ws = replicate_params(w, mesh)

    f = jax.jit(lambda a, b: jax.nn.relu(a @ b - 10.0))
    got = np.asarray(f(xs, ws))
    want = np.asarray(f(x, w))
    np.testing.assert_allclose(got, want)
    # the batch axis stays sharded over "data"
    out_sharding = f(xs, ws).sharding
    assert len(out_sharding.device_set) == 8


def test_shard_batch_tree(devices_ok):
    mesh = make_mesh(8)
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((7,))}  # 7 not divisible
    sh = shard_batch(tree, mesh)
    assert len(sh["a"].sharding.device_set) == 8
    # non-divisible leaf falls back to replication without error
    np.testing.assert_array_equal(np.asarray(sh["b"]), np.zeros((7,)))


# ---------------------------------------------------------------------
# Data-parallel BatchedEngine: the serving engine itself over the mesh
# ---------------------------------------------------------------------

import asyncio

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


def _run(coro):
    return asyncio.get_event_loop_policy().new_event_loop().run_until_complete(coro)


@pytest.fixture(scope="module")
def stack():
    cfg = tiny()
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tr = Transcriber(cfg, params, ByteTokenizer(cfg), prefill_buckets=(64, 128))
    return cfg, tr


def test_batched_engine_data_parallel_token_parity(devices_ok, stack):
    """BatchedEngine ON THE MESH (params replicated, slot state sharded over
    'data') must produce token-for-token the same results as the
    single-device engine for concurrent requests."""
    cfg, tr = stack
    audios = [_audio(0.3 + 0.05 * i, f=200 + 70 * i, seed=i) for i in range(8)]
    golden = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in audios]

    mesh = make_mesh(8)

    async def go():
        eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=32, mesh=mesh)
        assert eng.data_parallel == 8
        # the slot axis must actually be sharded over all 8 devices
        assert len(eng.cache_k.sharding.device_set) == 8
        assert len(eng.out_tokens.sharding.device_set) == 8
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


def test_batched_engine_dp_with_fused_dual_decode(devices_ok, stack):
    """FUSE_DUAL_DECODE on the 8-device mesh: the fused dual-pool program
    concatenates arrays sharded over 'data' — GSPMD must handle it with
    token parity (a user can enable both knobs together)."""
    cfg, tr = stack
    shorts = [_audio(0.3, f=210 + 60 * i, seed=50 + i) for i in range(3)]
    longs = [_audio(0.5, f=420 + 80 * i, seed=60 + i) for i in range(2)]
    golden_s = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in shorts]
    golden_l = [tr.transcribe(a, SR, max_new_tokens=24).tokens for a in longs]

    mesh = make_mesh(8)

    async def go():
        eng = BatchedEngine(
            tr, EnergyVad(), slots=8, max_decode_tokens=32, mesh=mesh,
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
    for i, (g, w) in enumerate(zip(got, golden_s + golden_l)):
        np.testing.assert_array_equal(g, w, err_msg=f"request {i}")


def test_batched_engine_dp_speculative_finals(devices_ok, stack):
    """Speculative finals on the 8-device mesh: the verify program indexes
    the sharded slot axis like the decode programs (identity-row gathers/
    scatters), so drafted requests must stay token-exact and the verify
    path must actually run (the rows ladder is empty under a mesh — only
    the full-rows variant dispatches)."""
    cfg, tr = stack
    audios = [_audio(0.4 + 0.05 * i, f=230 + 60 * i, seed=80 + i) for i in range(4)]
    golden = [tr.transcribe(a, SR, max_new_tokens=20).tokens for a in audios]

    mesh = make_mesh(8)

    async def go():
        eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=32, mesh=mesh)
        assert eng.speculative
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

    got, stats = _run(go())
    assert stats.get("verify_rounds", 0) > 0, stats
    for i, (g, w) in enumerate(zip(got, golden)):
        np.testing.assert_array_equal(g, w, err_msg=f"request {i}")


def test_shard_params_tp_placement(devices_ok, stack):
    """TP placement rules: column/row pairs shard over 'model', norms and
    embeddings replicate, indivisible axes fall back to replication."""
    cfg, tr = stack
    mesh = make_mesh(8, model_parallel=2)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tp = shard_params_tp(params, mesh)

    def spec(x):
        return tuple(x.sharding.spec)

    dl = tp["decoder"]["layers"]
    assert spec(dl["qkv_w"]) == (None, None, "model")
    assert spec(dl["o_w"]) == (None, "model", None)
    assert spec(dl["gate_up_w"]) == (None, None, "model")
    assert spec(dl["down_w"]) == (None, "model", None)
    assert spec(dl["ln1_scale"]) == ()  # replicated
    assert spec(tp["decoder"]["embed"]) == ()  # replicated (skip-list trio)
    el = tp["encoder"]["layers"]
    assert spec(el["q_w"]) == (None, None, "model")
    assert spec(el["o_w"]) == (None, "model", None)
    assert spec(el["fc2_w"]) == (None, "model", None)
    assert spec(tp["adapter"]["fc1"]["w"]) == (None, "model")
    assert spec(tp["adapter"]["fc2"]["w"]) == ("model", None)
    # every leaf placed on all 8 devices (replicated over "data")
    for leaf in jax.tree.leaves(tp):
        assert len(leaf.sharding.device_set) == 8

    # int8 QTensors: "q" shards like the wrapped weight; per-output "scale"
    # shards only under output-parallel specs (contracted axis is 1)
    from sonicscribe_tpu.ops.quant import quantize_params_int8

    tq = shard_params_tp(quantize_params_int8(params), mesh)
    dq = tq["decoder"]["layers"]
    assert spec(dq["qkv_w"]["q"]) == (None, None, "model")
    assert spec(dq["qkv_w"]["scale"]) == (None, None, "model")
    assert spec(dq["down_w"]["q"]) == (None, "model", None)
    assert spec(dq["down_w"]["scale"]) == ()  # axis of size 1 -> replicated


def test_batched_engine_tensor_parallel_token_parity(devices_ok, stack):
    """BatchedEngine on a dp x tp mesh (4 x 2): weight matrices sharded over
    'model' (Megatron column/row pairs), slot state sharded over 'data' —
    GSPMD inserts the psums; tokens must match the single-device engine
    exactly (f32: the tp=2 contraction split does not move greedy argmax)."""
    cfg, tr = stack
    audios = [_audio(0.3 + 0.05 * i, f=200 + 70 * i, seed=i) for i in range(8)]
    golden = [tr.transcribe(a, SR, max_new_tokens=8).tokens for a in audios]

    mesh = make_mesh(8, model_parallel=2)

    async def go():
        eng = BatchedEngine(tr, EnergyVad(), slots=8, max_decode_tokens=32, mesh=mesh)
        assert eng.data_parallel == 4
        # params actually sharded over "model"
        qkv = eng.transcriber.params["decoder"]["layers"]["qkv_w"]
        assert tuple(qkv.sharding.spec) == (None, None, "model")
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


def test_batched_engine_data_parallel_ring_path(devices_ok, stack):
    """The realtime path (packed chunk scatter into the sharded device ring,
    batched ring VAD, ring prefill) on the mesh matches the host-audio path
    token-for-token."""
    cfg, tr = stack
    mesh = make_mesh(8)
    audio = _audio(64 * 10 / 1000.0, f=440, seed=3)  # 10 chunks of 64 ms
    golden = tr.transcribe(audio, SR, max_new_tokens=8, hotwords=None).tokens

    async def go():
        eng = BatchedEngine(tr, EnergyVad(), slots=4, max_decode_tokens=32, mesh=mesh)
        try:
            s = eng.alloc_stream()
            pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
            for c in range(10):
                eng.ingest(s, c, pcm[c * 2048:(c + 1) * 2048])
            prob = await eng.vad_window_ring(s, 0)
            assert 0.0 <= prob <= 1.0
            r = await eng.transcribe_ring(s, 0, 10, max_new_tokens=8)
            eng.free_stream(s)
            return r.tokens
        finally:
            eng.shutdown()

    got = _run(go())
    # ring path quantizes audio to int16 before mel; the host path doesn't.
    # transcribe() of the int16-roundtripped audio is the exact golden.
    rt = (np.clip(audio, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32768.0
    golden_rt = tr.transcribe(rt, SR, max_new_tokens=8).tokens
    ok = np.array_equal(got, golden_rt) or np.array_equal(got, golden)
    assert ok, f"ring-path tokens {got} match neither golden {golden_rt} nor {golden}"


def test_build_runtime_data_parallel(devices_ok):
    """config.data_parallel is a live knob: build_runtime constructs the mesh
    and the engine state is sharded."""
    from sonicscribe_tpu.config import AppConfig
    from sonicscribe_tpu.serve.app import build_runtime

    cfg = AppConfig()
    cfg.data_parallel = 8
    cfg.decode_slots = 8
    engine, vad, info = build_runtime("tiny-random", "energy", cfg, "batched")
    assert info["data_parallel"] == 8
    assert engine.mesh is not None
    assert len(engine.ring.sharding.device_set) == 8
    engine.shutdown()
