// sdsp_io — native host-side streaming runtime for simpledsp_tpu.
//
// The TPU owns the math (JAX/XLA/Pallas); this library owns the host side
// of the pipeline: a lock-free single-producer/single-consumer byte ring
// buffer, SDR sample-format converters (interleaved int8/int16 IQ ->
// separate float32 re/im planes, matching the framework's RI data path),
// and a background file/fd reader thread.  It plays the role the
// reference's native code plays for compute (include/sdsp/*.h is all
// native C++): keeping the non-XLA part of the framework compiled code,
// not Python loops.
//
// C ABI only (consumed via ctypes from simpledsp_tpu/runtime/stream.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// Lock-free SPSC ring buffer (byte-oriented, contiguous push/pop).
// ---------------------------------------------------------------------------

struct SdspRing {
    uint8_t* buf;
    size_t capacity;                 // power of two
    std::atomic<uint64_t> head;      // write cursor (producer)
    std::atomic<uint64_t> tail;      // read cursor (consumer)
};

static size_t round_up_pow2(size_t v) {
    size_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

SdspRing* sdsp_ring_create(size_t capacity) {
    capacity = round_up_pow2(capacity);
    auto* r = new SdspRing();
    r->buf = static_cast<uint8_t*>(std::malloc(capacity));
    if (!r->buf) { delete r; return nullptr; }
    r->capacity = capacity;
    r->head.store(0, std::memory_order_relaxed);
    r->tail.store(0, std::memory_order_relaxed);
    return r;
}

void sdsp_ring_destroy(SdspRing* r) {
    if (!r) return;
    std::free(r->buf);
    delete r;
}

size_t sdsp_ring_capacity(const SdspRing* r) { return r->capacity; }

size_t sdsp_ring_readable(const SdspRing* r) {
    return static_cast<size_t>(r->head.load(std::memory_order_acquire) -
                               r->tail.load(std::memory_order_acquire));
}

size_t sdsp_ring_writable(const SdspRing* r) {
    return r->capacity - sdsp_ring_readable(r);
}

// Returns bytes actually pushed (0..n); never blocks.
size_t sdsp_ring_push(SdspRing* r, const uint8_t* src, size_t n) {
    const uint64_t head = r->head.load(std::memory_order_relaxed);
    const uint64_t tail = r->tail.load(std::memory_order_acquire);
    const size_t free_space = r->capacity - static_cast<size_t>(head - tail);
    if (n > free_space) n = free_space;
    if (n == 0) return 0;
    const size_t off = static_cast<size_t>(head) & (r->capacity - 1);
    const size_t first = (off + n <= r->capacity) ? n : r->capacity - off;
    std::memcpy(r->buf + off, src, first);
    if (n > first) std::memcpy(r->buf, src + first, n - first);
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// Returns bytes actually popped (0..n); never blocks.
size_t sdsp_ring_pop(SdspRing* r, uint8_t* dst, size_t n) {
    const uint64_t tail = r->tail.load(std::memory_order_relaxed);
    const uint64_t head = r->head.load(std::memory_order_acquire);
    const size_t avail = static_cast<size_t>(head - tail);
    if (n > avail) n = avail;
    if (n == 0) return 0;
    const size_t off = static_cast<size_t>(tail) & (r->capacity - 1);
    const size_t first = (off + n <= r->capacity) ? n : r->capacity - off;
    std::memcpy(dst, r->buf + off, first);
    if (n > first) std::memcpy(dst + first, r->buf, n - first);
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

// ---------------------------------------------------------------------------
// SDR sample-format converters.  All write float32 planes, the framework's
// native IQ representation (complex never materializes on the TPU path).
// ---------------------------------------------------------------------------

// Interleaved int16 IQ -> separate re/im float planes, scaled by 1/32768.
void sdsp_cvt_iq16_planes(const int16_t* src, float* re, float* im,
                          size_t npairs, float scale) {
    for (size_t i = 0; i < npairs; ++i) {
        re[i] = static_cast<float>(src[2 * i]) * scale;
        im[i] = static_cast<float>(src[2 * i + 1]) * scale;
    }
}

// Interleaved uint8 IQ (RTL-SDR convention, offset 127.5) -> planes.
void sdsp_cvt_iqu8_planes(const uint8_t* src, float* re, float* im,
                          size_t npairs, float scale) {
    for (size_t i = 0; i < npairs; ++i) {
        re[i] = (static_cast<float>(src[2 * i]) - 127.5f) * scale;
        im[i] = (static_cast<float>(src[2 * i + 1]) - 127.5f) * scale;
    }
}

// Real int16 -> float32.
void sdsp_cvt_i16_f32(const int16_t* src, float* dst, size_t n, float scale) {
    for (size_t i = 0; i < n; ++i)
        dst[i] = static_cast<float>(src[i]) * scale;
}

// float32 -> int16 with clamping (for writing demodulated audio out).
void sdsp_cvt_f32_i16(const float* src, int16_t* dst, size_t n, float scale) {
    for (size_t i = 0; i < n; ++i) {
        float v = src[i] * scale;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        dst[i] = static_cast<int16_t>(v);
    }
}

// ---------------------------------------------------------------------------
// Background file reader: a thread that streams a file into a ring buffer.
// ---------------------------------------------------------------------------

struct SdspFileSource {
    SdspRing* ring;         // not owned
    std::FILE* fp;          // owned
    std::thread worker;
    std::atomic<int> state; // 0 running, 1 eof, 2 stop requested, 3 error
    size_t chunk;
};

static void file_source_loop(SdspFileSource* s) {
    uint8_t* tmp = static_cast<uint8_t*>(std::malloc(s->chunk));
    if (!tmp) { s->state.store(3); return; }
    while (s->state.load(std::memory_order_relaxed) == 0) {
        const size_t got = std::fread(tmp, 1, s->chunk, s->fp);
        if (got == 0) { s->state.store(1); break; }
        size_t off = 0;
        while (off < got && s->state.load(std::memory_order_relaxed) == 0) {
            off += sdsp_ring_push(s->ring, tmp + off, got - off);
            if (off < got)  // ring full: let the consumer drain
                std::this_thread::yield();
        }
    }
    std::free(tmp);
}

SdspFileSource* sdsp_file_source_start(const char* path, SdspRing* ring,
                                       size_t chunk) {
    std::FILE* fp = std::fopen(path, "rb");
    if (!fp) return nullptr;
    auto* s = new SdspFileSource();
    s->ring = ring;
    s->fp = fp;
    s->chunk = chunk ? chunk : (1 << 16);
    s->state.store(0);
    s->worker = std::thread(file_source_loop, s);
    return s;
}

// 0 running, 1 eof, 2 stopped, 3 error
int sdsp_file_source_state(const SdspFileSource* s) { return s->state.load(); }

void sdsp_file_source_stop(SdspFileSource* s) {
    if (!s) return;
    int expected = 0;
    s->state.compare_exchange_strong(expected, 2);
    if (s->worker.joinable()) s->worker.join();
    std::fclose(s->fp);
    delete s;
}

}  // extern "C"
