/**
 * Realtime tab: mic -> AudioWorklet -> WS binary 2048-byte frames;
 * two-phase transcript rendering (tentative spans replaced by committed
 * segments keyed by chunk-id ranges).
 *
 * Behavior parity with the reference RealTimeChat component
 * (frontend/src/components/RealTimeChat.js): ws/wss auto-switch, 30 s connect
 * timeout, heartbeat ping every 5 s, auto-reconnect <= 5 attempts with linear
 * backoff, VU meter from chunk RMS, debounced VAD threshold POST, hotwords —
 * which this build actually wires into decoding server-side.
 */
import { t, own, release } from "/static/i18n.js";

const WS_PATH = "/ws/audio";
const MAX_RECONNECT = 5;

export class RealtimeChat {
  constructor() {
    this.ws = null;
    this.audioCtx = null;
    this.worklet = null;
    this.stream = null;
    this.recording = false;
    this.reconnects = 0;
    this.chunkCount = 0;
    this.segments = new Map(); // segment_id -> element
    this.tentativeEl = null;
    this.tentativeRange = null;

    this.el = {
      startBtn: document.getElementById("startBtn"),
      vadEnabled: document.getElementById("vadEnabled"),
      vadThreshold: document.getElementById("vadThreshold"),
      vadThresholdVal: document.getElementById("vadThresholdVal"),
      vu: document.getElementById("vuFill"),
      transcript: document.getElementById("realtimeTranscript"),
      status: document.getElementById("rtStatus"),
      hotwords: document.getElementById("hotwords"),
      hotwordsBtn: document.getElementById("hotwordsBtn"),
    };
    this.el.startBtn.onclick = () => this.toggle();
    this.el.hotwordsBtn.onclick = () => this.sendHotwords();
    this.el.vadEnabled.onchange = () => this.sendVadConfig();
    let deb = null;
    this.el.vadThreshold.oninput = () => {
      this.el.vadThresholdVal.textContent =
        Number(this.el.vadThreshold.value).toFixed(2);
      clearTimeout(deb);
      deb = setTimeout(() => this.sendVadConfig(), 300); // debounce 300 ms
    };
    this.pingTimer = null;
  }

  /** Single-key status: stays i18n-owned, so it re-translates on a
   * mid-session language toggle (recording / stopped / connection lost). */
  statusKey(key, cls = "") {
    own(this.el.status, key);
    this.el.status.className = "status " + cls;
  }

  /** Composite status (ids, counters, error detail): the runtime owns the
   * string — a language toggle must not clobber it back to the static
   * "disconnected" default. */
  status(msg, cls = "") {
    release(this.el.status);
    this.el.status.textContent = msg;
    this.el.status.className = "status " + cls;
  }

  wsUrl() {
    const proto = location.protocol === "https:" ? "wss" : "ws";
    const resume = this.clientId ? `?resume=${this.clientId}` : "";
    return `${proto}://${location.host}${WS_PATH}${resume}`;
  }

  async toggle() {
    if (this.recording) return this.stop();
    try {
      await this.start();
    } catch (e) {
      this.status(`${t("start_failed")}: ${e.message}`, "errline");
    }
  }

  async start() {
    this.statusKey("connecting");
    await this.connect();
    this.stream = await navigator.mediaDevices.getUserMedia({
      audio: {
        sampleRate: 16000, channelCount: 1,
        echoCancellation: true, noiseSuppression: true, autoGainControl: true,
      },
    });
    this.audioCtx = new AudioContext({ sampleRate: 16000 });
    await this.audioCtx.audioWorklet.addModule("/static/pcm-processor.js");
    const src = this.audioCtx.createMediaStreamSource(this.stream);
    this.worklet = new AudioWorkletNode(this.audioCtx, "pcm-processor");
    this.worklet.port.onmessage = (ev) => this.onChunk(ev.data);
    src.connect(this.worklet);
    this.recording = true;
    own(this.el.startBtn, "stop"); // re-key: survives language toggles
    this.el.startBtn.className = "danger";
    this.statusKey("recording");
    this.pingTimer = setInterval(() => this.send({ type: "ping" }), 5000);
  }

  stop() {
    this.recording = false;
    clearInterval(this.pingTimer);
    if (this.worklet) this.worklet.disconnect();
    if (this.stream) this.stream.getTracks().forEach((t) => t.stop());
    if (this.audioCtx) this.audioCtx.close();
    if (this.ws && this.ws.readyState === WebSocket.OPEN) {
      this.send({ type: "close" });
      this.ws.close();
    }
    this.ws = null;
    own(this.el.startBtn, "start");
    this.el.startBtn.className = "primary";
    this.el.vu.style.width = "0%";
    this.statusKey("stopped");
  }

  connect() {
    return new Promise((resolve, reject) => {
      const ws = new WebSocket(this.wsUrl());
      ws.binaryType = "arraybuffer";
      const timeout = setTimeout(() => {
        ws.close();
        reject(new Error("connect timeout (30 s)"));
      }, 30000);
      ws.onopen = () => {
        clearTimeout(timeout);
        this.ws = ws;
        this.reconnects = 0;
        resolve();
      };
      ws.onmessage = (ev) => this.onMessage(ev);
      ws.onerror = () => {};
      ws.onclose = () => {
        clearTimeout(timeout);
        if (this.recording && this.reconnects < MAX_RECONNECT) {
          this.reconnects += 1;
          this.status(`${t("reconnecting")} (${this.reconnects}/${MAX_RECONNECT})…`, "errline");
          setTimeout(() => this.connect().catch(() => {}),
                     1000 * this.reconnects); // linear backoff
        } else if (this.recording) {
          this.statusKey("connection_lost", "errline");
          this.stop();
        }
      };
    });
  }

  send(obj) {
    if (this.ws && this.ws.readyState === WebSocket.OPEN) {
      this.ws.send(JSON.stringify(obj));
    }
  }

  onChunk(buf) {
    // VU meter from RMS of the int16 chunk
    const view = new Int16Array(buf);
    let acc = 0;
    for (let i = 0; i < view.length; i++) acc += view[i] * view[i];
    const rms = Math.sqrt(acc / view.length) / 32768;
    this.el.vu.style.width = `${Math.min(100, rms * 300)}%`;
    if (this.ws && this.ws.readyState === WebSocket.OPEN) {
      this.ws.send(buf); // exactly 2048 bytes
      this.chunkCount += 1;
    }
  }

  sendHotwords() {
    const words = this.el.hotwords.value
      .split(",").map((w) => w.trim()).filter(Boolean).slice(0, 10);
    this.send({ type: "hotwords_config", hotwords: words });
  }

  async sendVadConfig() {
    this.send({
      type: "vad_config",
      vad_enabled: this.el.vadEnabled.checked,
      threshold: Number(this.el.vadThreshold.value),
    });
  }

  onMessage(ev) {
    if (typeof ev.data !== "string") return;
    let msg;
    try { msg = JSON.parse(ev.data); } catch { return; }
    switch (msg.type) {
      case "connection_established":
        this.clientId = msg.client_id; // kept for ?resume= on reconnect
        this.status(`${t("connected")} (${msg.client_id})${msg.resumed ? " [resumed]" : ""}`);
        break;
      case "tentative_output":
        this.renderTentative(msg);
        break;
      case "committed_output":
        this.renderCommitted(msg);
        break;
      case "hotwords_updated":
        this.status(`hotwords: ${msg.hotwords.join(", ") || "(none)"}`);
        break;
      case "config_updated":
        this.status(`vad: ${msg.vad_enabled ? "on" : "off"}, threshold ${msg.threshold}`);
        break;
      case "error":
        this.status(`${msg.code}: ${msg.message}`, "errline");
        break;
      default:
        break; // pong, connection_state, debug_audio_info
    }
  }

  renderTentative(msg) {
    if (!this.tentativeEl) {
      this.tentativeEl = document.createElement("span");
      this.tentativeEl.className = "tentative";
      this.el.transcript.appendChild(this.tentativeEl);
    }
    this.tentativeEl.textContent = " " + (msg.text || msg.current_text || "");
    this.tentativeRange = [msg.start_chunk_id, msg.end_chunk_id];
    this.el.transcript.scrollTop = this.el.transcript.scrollHeight;
  }

  renderCommitted(msg) {
    // replace any tentative span whose chunk range overlaps the committed one
    if (
      this.tentativeEl &&
      this.tentativeRange &&
      this.tentativeRange[0] <= msg.end_chunk_id &&
      this.tentativeRange[1] >= msg.start_chunk_id
    ) {
      this.tentativeEl.remove();
      this.tentativeEl = null;
      this.tentativeRange = null;
    }
    let el = this.segments.get(msg.segment_id);
    if (!el) {
      el = document.createElement("div");
      el.className = "committed";
      const t = document.createElement("span");
      t.className = "seg-time";
      t.textContent = `[${msg.start_time.toFixed(1)}s–${msg.end_time.toFixed(1)}s]`;
      el.appendChild(t);
      el.appendChild(document.createElement("span"));
      this.segments.set(msg.segment_id, el);
      this.el.transcript.appendChild(el);
    }
    el.lastChild.textContent = msg.text;
    this.el.transcript.scrollTop = this.el.transcript.scrollHeight;
  }
}
