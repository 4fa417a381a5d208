"""Integration tests: the full REST + WS protocol against a live aiohttp app
with the tiny random model and the EnergyVad (SURVEY.md §4 level-3 testing —
the reference has no tests; the protocol schema is SURVEY.md §2.7)."""

import asyncio
import json

import numpy as np
import pytest

from sonicscribe_tpu.audio.wav import write_wav
from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.serve.app import build_app, build_runtime

SR = 16000


def _speech(sec, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * sec)) / SR
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    x = 0.25 * env * sum(np.sin(2 * np.pi * f * t) for f in (200, 700, 1500, 2600))
    return (x + 0.002 * rng.standard_normal(len(t))).astype(np.float32)


def _silence(sec, seed=1):
    return (0.0006 * np.random.default_rng(seed).standard_normal(int(SR * sec))).astype(
        np.float32
    )


# Frozen wire-protocol schemas (SURVEY.md §2.7): exact field sets per message
# type. Fields may only be ADDED here deliberately — accidental drift in any
# message constructor fails the integration tests below.
WS_SCHEMA = {
    "connection_established": {
        "type", "client_id", "resumed", "config", "capabilities",
    },
    "tentative_output": {
        "type", "current_text", "text", "start_chunk_id", "end_chunk_id",
        "duration", "confidence", "processing_delay",
    },
    "committed_output": {
        "type", "text", "segment_id", "start_chunk_id", "end_chunk_id",
        "start_time", "end_time", "confidence", "processing_delay",
    },
    "pong": {"type", "t"},
    "connection_state": {
        "type", "client_id", "is_speaking", "vad_enabled", "vad_threshold",
        "buffered_chunks", "newest_chunk_id", "segments", "hotwords",
    },
    "config_updated": {"type", "vad_enabled", "threshold"},
    "hotwords_updated": {"type", "hotwords"},
    "error": {"type", "code", "message"},
    "debug_audio_info": {"type", "enabled", "path"},
}
FILE_SCHEMA = {
    "initialization": {
        "type", "filename", "audio_duration", "vad_enabled", "hotwords",
        "max_segment_duration", "total_segments",
    },
    "segments_summary": {"type", "total_segments", "segments"},
    "segment_result": {
        "type", "segment_index", "original_index", "sub_segment_index",
        "start_time", "end_time", "text", "is_long_segment", "hotwords_used",
        "rtf", "progress",
    },
    "segment_error": {
        "type", "segment_index", "original_index", "start_time", "end_time",
        "error", "progress",
    },
    "final_summary": {
        "type", "total_segments", "successful_segments", "failed_segments",
        "audio_duration", "processing_time", "rtf", "full_text",
    },
}


def assert_schema(messages: list[dict], schema: dict) -> None:
    for m in messages:
        expected = schema.get(m["type"])
        if expected is not None:
            assert set(m) == expected, (
                f"wire-schema drift in {m['type']!r}: "
                f"extra={set(m) - expected}, missing={expected - set(m)}"
            )


@pytest.fixture(scope="module")
def runtime():
    cfg = AppConfig()
    engine, vad, info = build_runtime("tiny-random", "energy", cfg)
    return cfg, engine, vad, info


@pytest.fixture
def app(runtime):
    cfg, engine, vad, info = runtime
    return build_app(cfg, engine, vad, info)


async def test_health_and_debug_config(app, aiohttp_client):
    client = await aiohttp_client(app)
    r = await client.get("/health")
    assert r.status == 200
    body = await r.json()
    assert body["status"] == "ok" and body["model_loaded"]
    r = await client.get("/debug/config")
    d = await r.json()
    assert d["audio_chunk_size"] == 2048
    assert d["samples_per_chunk"] == 1024


async def test_health_degraded_when_engine_dead(app, aiohttp_client):
    """A crashed scheduler (tick-stall abort on a wedged device) must show
    in /health so a supervisor liveness probe can restart the process."""
    client = await aiohttp_client(app)
    app["engine"].alive  # property exists on the real engine

    class Dead:
        alive = False
        stats = {"ticks": 1}

    app["engine"] = Dead()
    body = await (await client.get("/health")).json()
    assert body["status"] == "degraded" and body["model_loaded"]


async def test_crash_self_heals_through_serving(app, aiohttp_client):
    """End-to-end self-heal: a wedged device tick crashes the engine
    (requests fail, /health degraded); once the stuck tick drains, the
    NEXT request restarts the scheduler in-process and /health returns to
    ok — a transient wedge needs no process bounce. (Module-scoped engine:
    the heal itself restores the fixture for later tests.)"""
    import time as _time

    client = await aiohttp_client(app)
    eng = app["engine"]
    real_tick = eng._tick
    dump_s, abort_s = eng.tick_stall_dump_s, eng.tick_stall_abort_s
    try:
        eng.tick_stall_dump_s, eng.tick_stall_abort_s = 0.1, 0.3
        eng._tick = lambda *_a, **_k: _time.sleep(2.0)  # wedge

        from aiohttp import FormData

        form = FormData()
        form.add_field("file", write_wav(_speech(1.0), SR), filename="t.wav")
        r = await client.post("/transcribe/file?stream=false", data=form)
        summary = (await r.json())["summary"]
        assert summary["failed_segments"] >= 1  # crash failed the request

        health = await (await client.get("/health")).json()
        assert health["status"] == "degraded"

        # wedged tick still stuck: serving stays degraded, requests error
        if eng._tick_busy:
            form = FormData()
            form.add_field("file", write_wav(_speech(1.0), SR), filename="t.wav")
            r = await client.post("/transcribe/file?stream=false", data=form)
            assert (await r.json())["summary"]["failed_segments"] >= 1
        for _ in range(200):  # wait for the stuck thread to drain
            if not eng._tick_busy:
                break
            await asyncio.sleep(0.05)
        assert not eng._tick_busy

        # device "recovers": next request self-heals the engine
        eng._tick = real_tick
        eng.tick_stall_dump_s, eng.tick_stall_abort_s = dump_s, abort_s
        form = FormData()
        form.add_field("file", write_wav(_speech(1.0), SR), filename="t.wav")
        r = await client.post("/transcribe/file?stream=false", data=form)
        summary = (await r.json())["summary"]
        assert summary["failed_segments"] == 0
        assert summary["successful_segments"] >= 1

        health = await (await client.get("/health")).json()
        assert health["status"] == "ok"
    finally:
        # leave the module-scoped engine HEALTHY for later tests even if an
        # assert above failed: restore the tick, drain the abandoned tick,
        # and force a restart
        eng._tick = real_tick
        eng.tick_stall_dump_s, eng.tick_stall_abort_s = dump_s, abort_s
        for _ in range(200):
            if not eng._tick_busy:
                break
            await asyncio.sleep(0.05)
        if not eng.alive:
            await eng.start()


async def test_vad_config_validation(app, aiohttp_client):
    client = await aiohttp_client(app)
    r = await client.post("/vad/config", json={"threshold": 0.7})
    assert r.status == 200
    assert (await r.json())["config"]["threshold"] == 0.7
    r = await client.post("/vad/config", json={"threshold": 7.0})
    assert r.status == 400
    r = await client.post("/vad/config", data=b"not json")
    assert r.status == 400


async def test_file_transcription_ndjson(app, aiohttp_client):
    client = await aiohttp_client(app)
    audio = np.concatenate([_silence(1.2), _speech(2.0), _silence(1.5)])
    wav = write_wav(audio, SR)

    from aiohttp import FormData

    form = FormData()
    form.add_field("file", wav, filename="test.wav", content_type="audio/wav")
    form.add_field("config_str", json.dumps({"hotwords": ["jax"], "vad_enabled": True}))

    r = await client.post("/transcribe/file?stream=true", data=form)
    assert r.status == 200
    lines = [json.loads(ln) for ln in (await r.text()).strip().split("\n")]
    types = [m["type"] for m in lines]
    assert types[0] == "initialization"
    assert types[1] == "segments_summary"
    assert types[-1] == "final_summary"
    assert "segment_result" in types
    seg = next(m for m in lines if m["type"] == "segment_result")
    assert {"segment_index", "start_time", "end_time", "text", "progress"} <= set(seg)
    assert seg["hotwords_used"] is True
    summary = lines[-1]
    assert summary["successful_segments"] >= 1
    assert summary["failed_segments"] == 0
    assert_schema(lines, FILE_SCHEMA)


async def test_file_transcription_aggregate_and_errors(app, aiohttp_client):
    client = await aiohttp_client(app)
    from aiohttp import FormData

    # aggregate mode
    form = FormData()
    form.add_field("file", write_wav(_speech(1.0), SR), filename="t.wav")
    r = await client.post("/transcribe/file?stream=false", data=form)
    assert r.status == 200
    body = await r.json()
    assert body["summary"]["type"] == "final_summary"

    # missing file field
    form = FormData()
    form.add_field("config_str", "{}")
    r = await client.post("/transcribe/file", data=form)
    assert r.status == 400

    # garbage payload
    form = FormData()
    form.add_field("file", b"\x00" * 100, filename="x.mp3")
    r = await client.post("/transcribe/file", data=form)
    assert r.status in (400, 415)


async def test_websocket_full_session(app, aiohttp_client):
    """Stream silence -> speech -> silence; expect tentative then committed."""
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio")

    hello = json.loads((await ws.receive_str()))
    assert hello["type"] == "connection_established"
    assert hello["config"]["audio_chunk_size"] == 2048

    # control: ping/state/hotwords
    await ws.send_str(json.dumps({"type": "ping"}))
    assert json.loads(await ws.receive_str())["type"] == "pong"
    await ws.send_str(json.dumps({"type": "hotwords_config", "hotwords": ["tpu", "jax"]}))
    assert json.loads(await ws.receive_str())["hotwords"] == ["tpu", "jax"]
    await ws.send_str(json.dumps({"type": "get_state"}))
    state = json.loads(await ws.receive_str())
    assert state["type"] == "connection_state" and state["hotwords"] == ["tpu", "jax"]

    audio = np.concatenate([_silence(0.7), _speech(2.4), _silence(1.6)])
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    msgs = []

    async def reader():
        while True:
            m = await ws.receive()
            if m.type.name != "TEXT":
                break
            msgs.append(json.loads(m.data))

    rtask = asyncio.ensure_future(reader())
    for off in range(0, len(pcm) - 2048, 2048):
        await ws.send_bytes(pcm[off : off + 2048])
        await asyncio.sleep(0.001)

    # wait for a committed_output (decode may take a while on CPU)
    for _ in range(600):
        if any(m["type"] == "committed_output" for m in msgs):
            break
        await asyncio.sleep(0.1)
    await ws.send_str(json.dumps({"type": "close"}))
    await asyncio.sleep(0.2)
    await ws.close()
    rtask.cancel()

    kinds = {m["type"] for m in msgs}
    assert "committed_output" in kinds, f"messages seen: {[m['type'] for m in msgs]}"
    assert_schema([hello, state] + msgs, WS_SCHEMA)
    committed = next(m for m in msgs if m["type"] == "committed_output")
    assert {"text", "segment_id", "start_chunk_id", "end_chunk_id", "confidence"} <= set(
        committed
    )
    assert committed["confidence"] == "high"
    # speech started ~0.7s in => start chunk should be > 0 and < 30
    assert 0 < committed["start_chunk_id"] < 30


async def test_websocket_frame_repair_and_bad_control(app, aiohttp_client):
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio")
    await ws.receive_str()  # hello

    # undersized and oversized frames must not kill the session
    await ws.send_bytes(b"\x01\x02" * 10)  # 20 bytes -> zero-padded
    await ws.send_bytes(b"\x00" * 5000)  # split into 3 frames
    await ws.send_str("this is not json")
    err = json.loads(await ws.receive_str())
    assert err["type"] == "error" and err["code"] == "bad_json"
    await ws.send_str(json.dumps({"type": "warp_drive"}))
    err = json.loads(await ws.receive_str())
    assert err["code"] == "unknown_message"
    # still alive
    await ws.send_str(json.dumps({"type": "ping"}))
    assert json.loads(await ws.receive_str())["type"] == "pong"
    await ws.close()


async def test_long_segment_cutting_via_config(app, aiohttp_client):
    """max_segment_duration in config_str pre-splits long segments
    (reference cut_long_segments, main.py:527-567)."""
    client = await aiohttp_client(app)
    from aiohttp import FormData

    audio = _speech(5.0)  # 5s continuous speech
    form = FormData()
    form.add_field("file", write_wav(audio, SR), filename="long.wav")
    form.add_field(
        "config_str",
        json.dumps({"vad_enabled": False, "max_segment_duration": 2.0}),
    )
    r = await client.post("/transcribe/file?stream=true", data=form)
    assert r.status == 200
    lines = [json.loads(ln) for ln in (await r.text()).strip().split("\n")]
    segs = [m for m in lines if m["type"] == "segment_result"]
    assert len(segs) == 3  # ceil(5/2)
    assert all(s["is_long_segment"] for s in segs)
    assert all(s["end_time"] - s["start_time"] <= 2.01 for s in segs)
    # sub-parts share original_index and carry distinct sub indices
    assert {s["original_index"] for s in segs} == {0}
    assert sorted(s["sub_segment_index"] for s in segs) == [0, 1, 2]


async def test_vad_threshold_reaches_live_sessions(app, aiohttp_client):
    """POST /vad/config threshold must change ALREADY-OPEN sessions'
    effective gate threshold (reference semantics: the mutated global is read
    by every path, main.py:658 + :312) — get_state on an open WS shows it."""
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio")
    msg = json.loads((await ws.receive()).data)
    assert msg["type"] == "connection_established"

    r = await client.post("/vad/config", json={"threshold": 0.85})
    assert r.status == 200

    await ws.send_str(json.dumps({"type": "get_state"}))
    for _ in range(10):
        msg = json.loads((await ws.receive()).data)
        if msg["type"] == "connection_state":
            break
    assert msg["type"] == "connection_state"
    assert abs(msg["vad_threshold"] - 0.85) < 1e-6

    await ws.send_str(json.dumps({"type": "close"}))
    await ws.close()
    # restore for other tests sharing the module-scoped runtime
    await client.post("/vad/config", json={"threshold": 0.6})
