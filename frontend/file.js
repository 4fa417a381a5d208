/**
 * File-analysis tab: drag-drop upload -> streaming NDJSON rendering.
 *
 * Behavior parity with the reference FileAnalyzer component
 * (frontend/src/components/FileAnalyzer.js): <=100 MB guard, incremental
 * NDJSON line parsing with partial-line reassembly, per-segment transcript
 * lines with timestamps, long-segment sub-part reassembly ordered by
 * sub_segment_index, completion summary cards. Fixes the reference gap where
 * the UI never sent config_str (FileAnalyzer.js:803-806 vs main.py:200):
 * here VAD enablement and hotwords are actually transmitted.
 *
 * Reference-parity capabilities (FileAnalyzer.js:683-766, 816-835):
 * - WAV files over 10 MB are compressed client-side before upload
 *   (OfflineAudioContext decode -> 16 kHz mono -> 16-bit WAV re-encode);
 * - upload is an XHR so the progress bar covers the upload phase (0-50%)
 *   and then streaming transcription progress (50-100%) — fetch() cannot
 *   report upload progress.
 */
import { t, own, release } from "/static/i18n.js";

const MAX_BYTES = 100 * 1024 * 1024;
const COMPRESS_THRESHOLD = 10 * 1024 * 1024;
const TARGET_SR = 16000;

export class FileAnalyzer {
  constructor() {
    this.file = null;
    this.el = {
      area: document.getElementById("uploadArea"),
      input: document.getElementById("fileInput"),
      vad: document.getElementById("fileVad"),
      hotwords: document.getElementById("fileHotwords"),
      btn: document.getElementById("transcribeFileBtn"),
      progressWrap: document.getElementById("progressWrap"),
      progress: document.getElementById("progressFill"),
      transcript: document.getElementById("fileTranscript"),
      cards: document.getElementById("summaryCards"),
      status: document.getElementById("fileStatus"),
    };
    this.segmentsMap = new Map(); // original_index -> {el, parts: Map}

    this.el.area.onclick = () => this.el.input.click();
    this.el.input.onchange = () => this.pick(this.el.input.files[0]);
    ["dragover", "dragenter"].forEach((t) =>
      this.el.area.addEventListener(t, (e) => {
        e.preventDefault();
        this.el.area.classList.add("drag");
      })
    );
    ["dragleave", "drop"].forEach((t) =>
      this.el.area.addEventListener(t, (e) => {
        e.preventDefault();
        this.el.area.classList.remove("drag");
      })
    );
    this.el.area.addEventListener("drop", (e) =>
      this.pick(e.dataTransfer.files[0])
    );
    this.el.btn.onclick = () => this.transcribe();
  }

  /** Single-key status: stays i18n-owned across language toggles. */
  statusKey(key, cls = "") {
    own(this.el.status, key);
    this.el.status.className = "status " + cls;
  }

  /** Composite status (progress %, error detail): runtime-owned; a
   * language toggle must not clobber it. */
  status(msg, cls = "") {
    release(this.el.status);
    this.el.status.textContent = msg;
    this.el.status.className = "status " + cls;
  }

  pick(file) {
    if (!file) return;
    if (file.size > MAX_BYTES) {
      this.statusKey("file_too_big", "errline");
      return;
    }
    this.file = file;
    // the drop area now shows the chosen file, not the static hint — a
    // language toggle must not clobber it back to the hint
    release(this.el.area);
    this.el.area.textContent = `${file.name} (${(file.size / 1e6).toFixed(1)} MB)`;
    this.el.btn.disabled = false;
  }

  /**
   * Client-side compression for big WAVs (reference FileAnalyzer.js:683-766):
   * decode with OfflineAudioContext, mix to mono at 16 kHz, re-encode as
   * 16-bit PCM WAV. Non-WAV or small files pass through untouched; any
   * decode failure falls back to the original file.
   */
  async compressIfLarge(file) {
    const isWav =
      /\.wav$/i.test(file.name) || file.type === "audio/wav" ||
      file.type === "audio/x-wav";
    if (!isWav || file.size <= COMPRESS_THRESHOLD) return file;
    this.statusKey("compressing");
    try {
      const raw = await file.arrayBuffer();
      const probe = new OfflineAudioContext(1, 1, TARGET_SR);
      const decoded = await probe.decodeAudioData(raw.slice(0));
      const frames = Math.ceil(decoded.duration * TARGET_SR);
      const ctx = new OfflineAudioContext(1, frames, TARGET_SR);
      const src = ctx.createBufferSource();
      src.buffer = decoded; // mono downmix + resample happen in the render
      src.connect(ctx.destination);
      src.start(0);
      const rendered = await ctx.startRendering();
      const wav = this.encodeWav(rendered.getChannelData(0), TARGET_SR);
      const name = file.name.replace(/\.wav$/i, "") + ".16k.wav";
      this.status(
        `compressed ${(file.size / 1e6).toFixed(1)} MB -> ` +
        `${(wav.size / 1e6).toFixed(1)} MB`
      );
      return new File([wav], name, { type: "audio/wav" });
    } catch (e) {
      this.status(`compression skipped (${e.message})`);
      return file;
    }
  }

  /** Float32 [-1,1] -> 16-bit PCM mono WAV blob. */
  encodeWav(samples, sr) {
    const buf = new ArrayBuffer(44 + samples.length * 2);
    const v = new DataView(buf);
    const str = (o, s) => { for (let i = 0; i < s.length; i++) v.setUint8(o + i, s.charCodeAt(i)); };
    str(0, "RIFF"); v.setUint32(4, 36 + samples.length * 2, true);
    str(8, "WAVE"); str(12, "fmt ");
    v.setUint32(16, 16, true); v.setUint16(20, 1, true); v.setUint16(22, 1, true);
    v.setUint32(24, sr, true); v.setUint32(28, sr * 2, true);
    v.setUint16(32, 2, true); v.setUint16(34, 16, true);
    str(36, "data"); v.setUint32(40, samples.length * 2, true);
    for (let i = 0; i < samples.length; i++) {
      const s = Math.max(-1, Math.min(1, samples[i]));
      v.setInt16(44 + i * 2, s < 0 ? s * 0x8000 : s * 0x7fff, true);
    }
    return new Blob([buf], { type: "audio/wav" });
  }

  async transcribe() {
    if (!this.file) return;
    this.el.btn.disabled = true;
    this.el.transcript.textContent = "";
    this.el.cards.textContent = "";
    this.segmentsMap.clear();
    this.el.progressWrap.style.display = "block";
    this.el.progress.style.width = "0%";

    const upload = await this.compressIfLarge(this.file);
    this.statusKey("uploading");

    const form = new FormData();
    form.append("file", upload, upload.name || this.file.name);
    form.append(
      "config_str",
      JSON.stringify({
        vad_enabled: this.el.vad.checked,
        hotwords: this.el.hotwords.value
          .split(",").map((w) => w.trim()).filter(Boolean).slice(0, 10),
      })
    );

    // XHR: fetch() cannot report upload progress. The bar covers the upload
    // phase (0-50%) then transcription progress (50-100%), and the NDJSON
    // response is parsed incrementally from responseText.
    await new Promise((resolve) => {
      const xhr = new XMLHttpRequest();
      xhr.open("POST", "/transcribe/file?stream=true");
      xhr.timeout = 5 * 60 * 1000;
      const uploadStart = performance.now();
      let seen = 0;
      let partial = "";
      const drain = (final) => {
        const text = xhr.responseText || "";
        partial += text.slice(seen);
        seen = text.length;
        const lines = partial.split("\n");
        partial = final ? "" : lines.pop();
        for (const line of lines) {
          if (!line.trim()) continue;
          try { this.onMessage(JSON.parse(line)); } catch (_e) { /* partial */ }
        }
      };
      xhr.upload.onprogress = (e) => {
        if (e.lengthComputable) {
          const pct = Math.round((e.loaded / e.total) * 100);
          this.el.progress.style.width = `${Math.round(pct / 2)}%`;
          const speed = FileAnalyzer.uploadSpeed(
            e.loaded, performance.now() - uploadStart
          );
          this.status(`${t("uploading")} ${pct}%${speed ? ` · ${speed}` : ""}`);
        }
      };
      xhr.upload.onload = () => {
        this.el.progress.style.width = "50%";
        this.statusKey("transcribing");
      };
      xhr.onprogress = () => drain(false);
      xhr.onload = () => {
        if (xhr.status !== 200) {
          this.status(
            `server error ${xhr.status}: ${(xhr.responseText || "").slice(0, 200)}`,
            "errline"
          );
        } else {
          drain(true);
        }
        resolve();
      };
      xhr.onerror = () => { this.statusKey("upload_failed", "errline"); resolve(); };
      xhr.ontimeout = () => { this.statusKey("timed_out", "errline"); resolve(); };
      xhr.send(form);
    });
    this.el.btn.disabled = false;
  }

  // Live upload-rate readout shown next to the percentage while the request
  // body is in flight (parity: reference FileAnalyzer.js:973-979). Returns
  // "" during the first 100 ms where the rate estimate is meaningless.
  static uploadSpeed(bytes, durationMs) {
    if (durationMs < 100) return "";
    const bps = bytes / (durationMs / 1000);
    if (bps > 1024 * 1024) return `${(bps / (1024 * 1024)).toFixed(1)} MB/s`;
    if (bps > 1024) return `${(bps / 1024).toFixed(1)} KB/s`;
    return `${bps.toFixed(0)} B/s`;
  }

  onMessage(msg) {
    switch (msg.type) {
      case "initialization":
        this.status(
          `${msg.total_segments} segments, ${msg.audio_duration.toFixed(1)} s audio`
        );
        break;
      case "segments_summary":
        break;
      case "segment_result":
        this.renderSegment(msg);
        // 0-50% is the upload phase; transcription covers 50-100%
        this.el.progress.style.width = `${Math.round(50 + msg.progress * 50)}%`;
        break;
      case "segment_error": {
        const el = document.createElement("div");
        el.className = "errline";
        el.textContent = `${t("segment_failed")} #${msg.segment_index}: ${msg.error}`;
        this.el.transcript.appendChild(el);
        break;
      }
      case "final_summary":
        this.renderSummary(msg);
        break;
      default:
        break;
    }
  }

  renderSegment(msg) {
    // long segments arrive as sub-parts; reassemble ordered by sub index
    let entry = this.segmentsMap.get(msg.original_index);
    if (!entry) {
      const el = document.createElement("div");
      el.className = "committed";
      const t = document.createElement("span");
      t.className = "seg-time";
      t.textContent = `[${msg.start_time.toFixed(1)}s]`;
      el.appendChild(t);
      el.appendChild(document.createElement("span"));
      this.el.transcript.appendChild(el);
      entry = { el, parts: new Map() };
      this.segmentsMap.set(msg.original_index, entry);
    }
    entry.parts.set(msg.sub_segment_index || 0, msg.text);
    const ordered = [...entry.parts.keys()].sort((a, b) => a - b)
      .map((k) => entry.parts.get(k));
    entry.el.lastChild.textContent = ordered.join(" ");
    this.el.transcript.scrollTop = this.el.transcript.scrollHeight;
  }

  renderSummary(msg) {
    this.el.progress.style.width = "100%";
    const cards = [
      ["segments", msg.total_segments],
      ["ok", msg.successful_segments],
      ["failed", msg.failed_segments],
      ["audio s", msg.audio_duration],
      ["wall s", msg.processing_time],
      ["RTF", msg.rtf],
    ];
    this.el.cards.textContent = "";
    for (const [k, v] of cards) {
      const c = document.createElement("div");
      c.className = "card";
      c.innerHTML = `<div class="v">${v}</div><div class="k">${k}</div>`;
      this.el.cards.appendChild(c);
    }
    this.statusKey(msg.failed_segments ? "done_errors" : "done");
  }
}
