/**
 * App shell: tab switching + lazy component init + health indicator.
 * (Reference: frontend/src/App.js semantics — RealTimeChat eager, cleanup on
 * beforeunload.)
 */
import { RealtimeChat } from "/static/realtime.js";
import { FileAnalyzer } from "/static/file.js";
import { apply as i18nApply, getLang, setLang } from "/static/i18n.js";

// language toggle (reference UI ships Chinese labels; we serve both)
i18nApply();
const langBtn = document.getElementById("langBtn");
function syncLangBtn() {
  langBtn.textContent = getLang() === "zh" ? "EN" : "中文";
}
syncLangBtn();
langBtn.onclick = () => {
  setLang(getLang() === "zh" ? "en" : "zh");
  syncLangBtn();
};

const tabs = {
  realtime: {
    btn: document.getElementById("tabRealtimeBtn"),
    panel: document.getElementById("tabRealtime"),
  },
  file: {
    btn: document.getElementById("tabFileBtn"),
    panel: document.getElementById("tabFile"),
  },
};

const rt = new RealtimeChat();
let fileAnalyzer = null;

function show(name) {
  for (const [k, t] of Object.entries(tabs)) {
    t.btn.classList.toggle("active", k === name);
    t.panel.classList.toggle("active", k === name);
  }
  if (name === "file" && !fileAnalyzer) fileAnalyzer = new FileAnalyzer();
}
tabs.realtime.btn.onclick = () => show("realtime");
tabs.file.btn.onclick = () => show("file");

window.addEventListener("beforeunload", () => {
  if (rt.recording) rt.stop();
});

async function health() {
  const dot = document.getElementById("healthDot");
  try {
    const r = await fetch("/health");
    const h = await r.json();
    dot.style.background = h.model_loaded ? "var(--ok)" : "var(--warn)";
    dot.title = `backend: ${h.model_info.model || "?"} on ${h.model_info.backend || "?"}, ` +
      `${h.active_sessions} sessions`;
  } catch {
    dot.style.background = "var(--err)";
    dot.title = "backend unreachable";
  }
}
health();
setInterval(health, 10000);
