"""Session resume: abnormal disconnects park the session; ?resume=<client_id>
re-attaches hotwords/gate/buffer state (stretch beyond the reference, which
always restarted sessions — SURVEY.md §5.4)."""

import json

import pytest

from sonicscribe_tpu.config import AppConfig
from sonicscribe_tpu.serve.app import build_app, build_runtime


@pytest.fixture(scope="module")
def runtime():
    cfg = AppConfig()
    engine, vad, info = build_runtime("tiny-random", "energy", cfg)
    return cfg, engine, vad, info


@pytest.fixture
def app(runtime):
    cfg, engine, vad, info = runtime
    return build_app(cfg, engine, vad, info)


async def test_resume_preserves_session_state(app, aiohttp_client):
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio")
    hello = json.loads(await ws.receive_str())
    cid = hello["client_id"]
    assert hello["resumed"] is False
    await ws.send_str(json.dumps({"type": "hotwords_config", "hotwords": ["keep", "me"]}))
    await ws.receive_str()
    await ws.send_bytes(b"\x00" * 2048)
    # abnormal close: no {"type": "close"} control message
    await ws.close()

    ws2 = await client.ws_connect(f"/ws/audio?resume={cid}")
    hello2 = json.loads(await ws2.receive_str())
    assert hello2["resumed"] is True
    assert hello2["client_id"] == cid
    await ws2.send_str(json.dumps({"type": "get_state"}))
    state = json.loads(await ws2.receive_str())
    assert state["hotwords"] == ["keep", "me"]
    assert state["newest_chunk_id"] >= 0  # buffer survived
    await ws2.send_str(json.dumps({"type": "close"}))
    await ws2.close()


async def test_resume_unknown_id_starts_fresh(app, aiohttp_client):
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio?resume=nonexistent")
    hello = json.loads(await ws.receive_str())
    assert hello["resumed"] is False
    await ws.send_str(json.dumps({"type": "close"}))
    await ws.close()


async def test_detached_sessions_swept_without_new_connects(app, aiohttp_client):
    """The slot-leak regression (VERDICT r2 weak #3): abnormal disconnects
    with NO follow-on connections must still release their engine ring slots
    once the resume window expires — via the app's periodic sweeper, not
    only the on-connect sweep."""
    import asyncio

    app["resume_window_s"] = 0.2  # read by the sweeper started on startup
    client = await aiohttp_client(app)
    engine = app["engine"]
    free_before = len(engine._free_streams)

    for _ in range(5):
        ws = await client.ws_connect("/ws/audio")
        await ws.receive_str()
        await ws.send_bytes(b"\x00" * 2048)
        await ws.close()  # abnormal: no {"type": "close"}

    assert len(app["detached"]) == 5
    assert len(engine._free_streams) == free_before - 5  # slots held

    # no new connections; the periodic sweeper alone must reclaim the slots
    for _ in range(100):
        if len(engine._free_streams) == free_before and not app["detached"]:
            break
        await asyncio.sleep(0.05)
    assert app["detached"] == {}
    assert len(engine._free_streams) == free_before


async def test_explicit_close_is_not_resumable(app, aiohttp_client):
    client = await aiohttp_client(app)
    ws = await client.ws_connect("/ws/audio")
    cid = json.loads(await ws.receive_str())["client_id"]
    await ws.send_str(json.dumps({"type": "close"}))
    await ws.close()
    ws2 = await client.ws_connect(f"/ws/audio?resume={cid}")
    hello2 = json.loads(await ws2.receive_str())
    assert hello2["resumed"] is False  # cleanly closed sessions are gone
    await ws2.send_str(json.dumps({"type": "close"}))
    await ws2.close()
