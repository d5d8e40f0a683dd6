// flacx native host runtime.
//
// The TPU compute path is JAX/XLA; this small C++ library serves the host
// side of the pipeline, where Python-loop overhead would otherwise throttle
// a >400x-realtime encoder: gathering variable-length frame rows out of the
// device's padded [B, max_bytes] output into one contiguous stream, and
// table-driven CRC validation over many rows.
//
// Built by flacx/native/build.py (plain c++ -O3 -shared), loaded via ctypes
// with a pure-numpy fallback — no pybind11 dependency.

#include <cstdint>
#include <cstring>

extern "C" {

// Concatenate rows[i][:lengths[i]] into out; returns total bytes written.
// out must have capacity sum(lengths).
int64_t flacx_assemble_frames(const uint8_t* data, const int32_t* lengths,
                              int64_t n_rows, int64_t row_stride,
                              uint8_t* out) {
    int64_t pos = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t len = lengths[i];
        std::memcpy(out + pos, data + i * row_stride, len);
        pos += len;
    }
    return pos;
}

// CRC-16 (poly 0x8005, init 0, MSB-first) of rows[i][:lengths[i]].
void flacx_crc16_rows(const uint8_t* data, const int32_t* lengths,
                      int64_t n_rows, int64_t row_stride, uint16_t* out) {
    static uint16_t table[256];
    static bool init = false;
    if (!init) {
        for (int b = 0; b < 256; ++b) {
            uint32_t v = static_cast<uint32_t>(b) << 8;
            for (int i = 0; i < 8; ++i) {
                v <<= 1;
                if (v & 0x10000) v ^= 0x18005;
            }
            table[b] = static_cast<uint16_t>(v & 0xFFFF);
        }
        init = true;
    }
    for (int64_t r = 0; r < n_rows; ++r) {
        const uint8_t* row = data + r * row_stride;
        uint16_t crc = 0;
        const int64_t len = lengths[r];
        for (int64_t i = 0; i < len; ++i) {
            crc = static_cast<uint16_t>((crc << 8)
                                        ^ table[(crc >> 8) ^ row[i]]);
        }
        out[r] = crc;
    }
}

// Interleaved little-endian 24-bit packing (the WAV/MD5 payload form for
// 24-bit streams, which numpy cannot express as a dtype).
void flacx_pack24(const int32_t* samples, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t v = static_cast<uint32_t>(samples[i]);
        out[3 * i] = static_cast<uint8_t>(v);
        out[3 * i + 1] = static_cast<uint8_t>(v >> 8);
        out[3 * i + 2] = static_cast<uint8_t>(v >> 16);
    }
}

}  // extern "C"
