// Native host-side runtime for the streaming ingest path.
//
// The reference ships no first-party native code (SURVEY.md L0); its native
// work lived in pip deps (torchaudio/libsndfile/ffmpeg). In this framework
// the TPU owns all DSP/model compute, and the host-side per-chunk ingest
// path (PCM conversion, metrics, ring storage — crossed ~15x/s per session,
// x50+ sessions) is implemented here in C++ behind a ctypes boundary
// (sonicscribe_tpu/native/__init__.py), with a NumPy fallback when the
// shared library hasn't been built.
//
// Build: g++ -O3 -shared -fPIC -o libsonic_native.so sonic_native.cpp
// (driven by sonicscribe_tpu/native/build.py)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>

extern "C" {

// ---------------------------------------------------------------------
// PCM conversion + metrics
// ---------------------------------------------------------------------

void sonic_pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
    constexpr float k = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * k;
}

void sonic_f32_to_pcm16(const float* in, int64_t n, int16_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        out[i] = (int16_t)lrintf(v * 32767.0f);
    }
}

// RMS and peak of an int16 chunk (reference telemetry, main.py:687-699)
void sonic_rms_peak(const int16_t* in, int64_t n, float* rms, float* peak) {
    double acc = 0.0;
    int32_t pk = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = in[i];
        acc += (double)v * (double)v;
        int32_t a = v < 0 ? -v : v;
        if (a > pk) pk = a;
    }
    *rms = n > 0 ? (float)(sqrt(acc / (double)n) / 32768.0) : 0.0f;
    *peak = (float)(pk / 32768.0);
}

// ---------------------------------------------------------------------
// Fixed-chunk monotonic ring buffer (per session)
//
// Stores the last `capacity` chunks of `chunk_bytes` each under monotonic
// ids; old chunks are overwritten. Mirrors the retention semantics of the
// reference's AudioBufferManager (30 s window, audio_manager.py:35-58) with
// O(1) storage instead of a dict + timestamp sweep.
// ---------------------------------------------------------------------

struct SonicRing {
    uint8_t* data;
    int64_t chunk_bytes;
    int64_t capacity;   // in chunks
    int64_t next_id;    // id the next push receives
};

SonicRing* sonic_ring_create(int64_t capacity, int64_t chunk_bytes) {
    if (capacity <= 0 || chunk_bytes <= 0) return nullptr;
    auto* r = (SonicRing*)malloc(sizeof(SonicRing));
    if (!r) return nullptr;
    r->data = (uint8_t*)calloc((size_t)capacity, (size_t)chunk_bytes);
    if (!r->data) { free(r); return nullptr; }
    r->chunk_bytes = chunk_bytes;
    r->capacity = capacity;
    r->next_id = 0;
    return r;
}

void sonic_ring_free(SonicRing* r) {
    if (!r) return;
    free(r->data);
    free(r);
}

// push one chunk; returns its id
int64_t sonic_ring_push(SonicRing* r, const uint8_t* chunk) {
    int64_t id = r->next_id++;
    memcpy(r->data + (id % r->capacity) * r->chunk_bytes, chunk,
           (size_t)r->chunk_bytes);
    return id;
}

int64_t sonic_ring_next_id(const SonicRing* r) { return r->next_id; }

int64_t sonic_ring_oldest_id(const SonicRing* r) {
    int64_t oldest = r->next_id - r->capacity;
    return oldest > 0 ? oldest : 0;
}

// copy chunks [start_id, end_id] into out (caller sizes it); returns the
// number of chunks copied (ids already evicted are skipped from the front)
int64_t sonic_ring_read_range(const SonicRing* r, int64_t start_id,
                              int64_t end_id, uint8_t* out) {
    int64_t oldest = sonic_ring_oldest_id(r);
    if (start_id < oldest) start_id = oldest;
    if (end_id >= r->next_id) end_id = r->next_id - 1;
    int64_t count = 0;
    for (int64_t id = start_id; id <= end_id; ++id, ++count) {
        memcpy(out + count * r->chunk_bytes,
               r->data + (id % r->capacity) * r->chunk_bytes,
               (size_t)r->chunk_bytes);
    }
    return count;
}

// fused: read range and convert to float32 in one pass
int64_t sonic_ring_read_range_f32(const SonicRing* r, int64_t start_id,
                                  int64_t end_id, float* out) {
    int64_t oldest = sonic_ring_oldest_id(r);
    if (start_id < oldest) start_id = oldest;
    if (end_id >= r->next_id) end_id = r->next_id - 1;
    constexpr float k = 1.0f / 32768.0f;
    int64_t samples_per = r->chunk_bytes / 2;
    int64_t count = 0;
    for (int64_t id = start_id; id <= end_id; ++id, ++count) {
        const int16_t* src =
            (const int16_t*)(r->data + (id % r->capacity) * r->chunk_bytes);
        float* dst = out + count * samples_per;
        for (int64_t i = 0; i < samples_per; ++i) dst[i] = src[i] * k;
    }
    return count;
}

}  // extern "C"
