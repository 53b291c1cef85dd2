// Native greedy sync-peak selector.
//
// Behavioral contract: reference src/decode.rs:204-263 (find_sync).
// The correlation itself runs on the TPU; this is the sequential
// bookkeeping pass — a literal transliteration of the reference scan,
// O(N) over the correlation stream, microseconds in native code.
//
// Built by noaa_apt_tpu/native/__init__.py (g++ -O3 -shared); loaded
// via ctypes with a NumPy fallback, so the framework degrades
// gracefully without a toolchain.

#include <cstdint>

extern "C" {

// Returns the number of peaks written to out_pos (capacity cap), or
// -1 if the capacity would be exceeded.
int64_t apt_find_sync_peaks(const float* corr, int64_t n, int64_t spr,
                            int64_t md, int64_t* out_pos, int64_t cap) {
    if (cap < 1) return -1;
    int64_t count = 1;
    out_pos[0] = 0;
    float last_val = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        const float c = corr[i];
        if (i - out_pos[count - 1] > md) {
            while (i / spr > count) {
                if (count >= cap) return -1;
                out_pos[count++] = i;
                last_val = c;
            }
        } else if (c > last_val) {
            out_pos[count - 1] = i;
            last_val = c;
        }
    }
    return count;
}

// Telemetry best-frame scan (reference telemetry.rs:201-227): first
// strict maximum of quality starting from 0.  Provided natively for
// symmetry; the host array is tiny.
int64_t apt_best_quality_row(const float* quality, int64_t n) {
    int64_t best = 0;
    float best_q = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        if (quality[i] > best_q) {
            best = i;
            best_q = quality[i];
        }
    }
    return best;
}

}  // extern "C"
