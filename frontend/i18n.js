/**
 * Minimal i18n: the reference UI ships Chinese labels and statuses
 * (reference frontend/public/index.html:321-365, 实时对话/文件分析); this
 * framework serves both languages — default from the browser locale, with a
 * header toggle persisted in localStorage. Static labels carry `data-i18n`
 * (textContent) / `data-i18n-ph` (placeholder) attributes; dynamic statuses
 * go through t().
 */

const dict = {
  en: {
    subtitle: "TPU-native realtime speech-to-text",
    tab_realtime: "Realtime",
    tab_file: "File analysis",
    start: "Start recording",
    stop: "Stop",
    vad: "VAD",
    threshold: "threshold",
    hotwords_ph: "hotwords, comma separated (max 10)",
    set_hotwords: "Set hotwords",
    drop_hint: "drop an audio file here or click to choose (WAV preferred; ≤100 MB)",
    vad_seg: "VAD segmentation",
    hotwords_file_ph: "hotwords, comma separated",
    transcribe: "Transcribe",
    disconnected: "disconnected",
    connecting: "connecting…",
    recording: "recording",
    stopped: "stopped",
    reconnecting: "reconnecting",
    connection_lost: "connection lost",
    connected: "connected",
    uploading: "uploading…",
    transcribing: "transcribing…",
    done: "done",
    done_errors: "done with errors",
    compressing: "compressing audio before upload…",
    file_too_big: "file exceeds 100 MB",
    upload_failed: "upload failed",
    timed_out: "request timed out",
    start_failed: "start failed",
    segment_failed: "segment failed",
  },
  zh: {
    // mirrors the reference UI's strings (reference index.html:321-365)
    subtitle: "TPU 原生实时语音转文字",
    tab_realtime: "实时对话",
    tab_file: "文件分析",
    start: "开始录音",
    stop: "停止",
    vad: "语音检测",
    threshold: "阈值",
    hotwords_ph: "热词，逗号分隔（最多 10 个）",
    set_hotwords: "设置热词",
    drop_hint: "拖放音频文件到此处或点击选择（推荐 WAV；≤100 MB）",
    vad_seg: "VAD 分段",
    hotwords_file_ph: "热词，逗号分隔",
    transcribe: "开始转写",
    disconnected: "未连接",
    connecting: "连接中…",
    recording: "录音中",
    stopped: "已停止",
    reconnecting: "重连中",
    connection_lost: "连接断开",
    connected: "已连接",
    uploading: "上传中…",
    transcribing: "转写中…",
    done: "完成",
    done_errors: "完成（部分失败）",
    compressing: "上传前压缩音频…",
    file_too_big: "文件超过 100 MB",
    upload_failed: "上传失败",
    timed_out: "请求超时",
    start_failed: "启动失败",
    segment_failed: "片段失败",
  },
};

// localStorage throws SecurityError in storage-blocked browsers; a throw
// here happens at module evaluation and would kill every importer (the
// whole UI), so storage is best-effort only
function storageGet(key) {
  try {
    return localStorage.getItem(key);
  } catch {
    return null;
  }
}
function storageSet(key, val) {
  try {
    localStorage.setItem(key, val);
  } catch {
    /* persistence unavailable: the toggle still works for this page */
  }
}

let lang =
  storageGet("lang") ||
  ((navigator.language || "").toLowerCase().startsWith("zh") ? "zh" : "en");

export function t(key) {
  return (dict[lang] && dict[lang][key]) || dict.en[key] || key;
}

export function getLang() {
  return lang;
}

export function setLang(l) {
  lang = dict[l] ? l : "en";
  storageSet("lang", lang);
  apply();
}

/**
 * Point a dynamic element at a new key: its text updates now AND follows
 * future language toggles (e.g. the start button flipping start <-> stop).
 */
export function own(el, key) {
  el.dataset.i18n = key;
  el.textContent = t(key);
}

/**
 * Release an element whose text the runtime now owns (composite status
 * strings, file names): apply() stops rewriting it, so a mid-session
 * language toggle can no longer clobber live state back to the static
 * default (e.g. "recording" -> "disconnected").
 */
export function release(el) {
  delete el.dataset.i18n;
}

/** Re-translate every element i18n still owns (data-i18n attribute). */
export function apply() {
  document.documentElement.lang = lang === "zh" ? "zh-CN" : "en";
  for (const el of document.querySelectorAll("[data-i18n]")) {
    el.textContent = t(el.dataset.i18n);
  }
  for (const el of document.querySelectorAll("[data-i18n-ph]")) {
    el.placeholder = t(el.dataset.i18nPh);
  }
}
