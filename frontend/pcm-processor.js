/**
 * AudioWorklet: buffers 1024 float samples (64 ms @ 16 kHz), converts to
 * int16 LE, posts one ArrayBuffer per chunk to the main thread.
 *
 * Wire-protocol parity with the reference worklet (frontend/public/
 * audio-worklets/pcm-processor.js: 1024-sample chunks, clamp + int16,
 * skip flushes < 80% full) — written fresh for this build.
 */
const CHUNK = 1024;
const MIN_FLUSH = Math.floor(CHUNK * 0.8);

class PCMProcessor extends AudioWorkletProcessor {
  constructor() {
    super();
    this.buf = new Float32Array(CHUNK);
    this.n = 0;
  }

  process(inputs) {
    const ch = inputs[0] && inputs[0][0];
    if (!ch) return true;
    let i = 0;
    while (i < ch.length) {
      const take = Math.min(CHUNK - this.n, ch.length - i);
      this.buf.set(ch.subarray(i, i + take), this.n);
      this.n += take;
      i += take;
      if (this.n === CHUNK) this.flush();
    }
    return true;
  }

  flush() {
    if (this.n < MIN_FLUSH) { this.n = 0; return; }
    const out = new Int16Array(CHUNK);
    for (let j = 0; j < this.n; j++) {
      const v = Math.max(-1, Math.min(1, this.buf[j]));
      out[j] = v < 0 ? v * 32768 : v * 32767;
    }
    // zero-fill any tail (server pads/repairs anyway)
    for (let j = this.n; j < CHUNK; j++) out[j] = 0;
    this.port.postMessage(out.buffer, [out.buffer]);
    this.buf = new Float32Array(CHUNK);
    this.n = 0;
  }
}

registerProcessor("pcm-processor", PCMProcessor);
