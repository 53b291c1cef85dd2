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

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

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

// Host-side polyphase resampler (reference dsp.rs:186-289 semantics,
// identical sequential accumulation order).  Used as an ingest stage
// when the host->accelerator link is the bottleneck: rate-converting
// 48 kHz audio to the 12.48 kHz work rate on the host cuts uploaded
// bytes ~4x.  Threaded over output ranges.
static void resample_range(const float* x, int64_t n, int64_t l, int64_t m,
                           const float* coeff, int64_t k, float* out,
                           int64_t k0, int64_t k1) {
    const int64_t offset = (k - 1) / 2;
    const int64_t jmax = 2 * offset;
    for (int64_t ki = k0; ki < k1; ++ki) {
        const int64_t km = ki * m;
        const int64_t p = (l - (km % l)) % l;
        int64_t xi = (km + p) / l;
        float sum = 0.0f;
        for (int64_t j = p; j <= jmax; j += l, ++xi) {
            if (xi < n) sum += coeff[j] * x[xi];
        }
        out[ki] = sum;
    }
}

int64_t apt_fast_resample(const float* x, int64_t n, int64_t l, int64_t m,
                          const float* coeff, int64_t k, float* out,
                          int64_t out_len, int64_t threads) {
    if (threads <= 1) {
        resample_range(x, n, l, m, coeff, k, out, 0, out_len);
        return out_len;
    }
    std::vector<std::thread> pool;
    const int64_t chunk = (out_len + threads - 1) / threads;
    for (int64_t t = 0; t < threads; ++t) {
        const int64_t k0 = t * chunk;
        const int64_t k1 = std::min(out_len, k0 + chunk);
        if (k0 >= k1) break;
        pool.emplace_back(resample_range, x, n, l, m, coeff, k, out, k0, k1);
    }
    for (auto& th : pool) th.join();
    return out_len;
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
