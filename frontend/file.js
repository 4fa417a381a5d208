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
 */

const MAX_BYTES = 100 * 1024 * 1024;

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

  status(msg, cls = "") {
    this.el.status.textContent = msg;
    this.el.status.className = "status " + cls;
  }

  pick(file) {
    if (!file) return;
    if (file.size > MAX_BYTES) {
      this.status("file exceeds 100 MB", "errline");
      return;
    }
    this.file = file;
    this.el.area.textContent = `${file.name} (${(file.size / 1e6).toFixed(1)} MB)`;
    this.el.btn.disabled = false;
  }

  async transcribe() {
    if (!this.file) return;
    this.el.btn.disabled = true;
    this.el.transcript.textContent = "";
    this.el.cards.textContent = "";
    this.segmentsMap.clear();
    this.el.progressWrap.style.display = "block";
    this.el.progress.style.width = "2%";
    this.status("uploading…");

    const form = new FormData();
    form.append("file", this.file, this.file.name);
    form.append(
      "config_str",
      JSON.stringify({
        vad_enabled: this.el.vad.checked,
        hotwords: this.el.hotwords.value
          .split(",").map((w) => w.trim()).filter(Boolean).slice(0, 10),
      })
    );

    let resp;
    try {
      resp = await fetch("/transcribe/file?stream=true", {
        method: "POST",
        body: form,
      });
    } catch (e) {
      this.status(`upload failed: ${e.message}`, "errline");
      this.el.btn.disabled = false;
      return;
    }
    if (!resp.ok) {
      const body = await resp.text();
      this.status(`server error ${resp.status}: ${body.slice(0, 200)}`, "errline");
      this.el.btn.disabled = false;
      return;
    }

    const reader = resp.body.getReader();
    const decoder = new TextDecoder();
    let partial = "";
    for (;;) {
      const { value, done } = await reader.read();
      if (done) break;
      partial += decoder.decode(value, { stream: true });
      const lines = partial.split("\n");
      partial = lines.pop(); // keep incomplete tail for reassembly
      for (const line of lines) {
        if (line.trim()) this.onMessage(JSON.parse(line));
      }
    }
    this.el.btn.disabled = false;
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
        this.el.progress.style.width = `${Math.round(msg.progress * 100)}%`;
        break;
      case "segment_error": {
        const el = document.createElement("div");
        el.className = "errline";
        el.textContent = `segment ${msg.segment_index} failed: ${msg.error}`;
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
    this.status(msg.failed_segments ? "done with errors" : "done");
  }
}
