// Native event-stream preprocessing (host-side hot loops).
//
// The reference implements its hot loops natively too: CUDA for the graph
// (src/dagr/graph/ev_graph.cu) and numba kernels for event subsampling /
// resize filtering (src/dagr/data/augment.py:13-37,
// scripts/downsample_events.py:108-123). On TPU the device-side work moved
// to Pallas/XLA; the host-side input pipeline (window slicing, rebasing,
// polarity mapping, downsample accumulation) lives here, called through
// ctypes from eventad_tpu.native.
//
// Build: g++ -O3 -march=native -shared -fPIC evio.cpp -o libevio.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Filter events into a window [t0, t1), rebase timestamps so the window
// ends at time_window, map polarity {0,1} -> {-1,+1}, drop y >= height.
// Returns the number of events written (<= capacity).
// (mirrors dsec_data.preprocess_events, dsec_data.py:124-130)
int64_t window_rebase(
    const uint16_t* x, const uint16_t* y, const int64_t* t,
    const uint8_t* p, int64_t n,
    int64_t t0, int64_t t1, int64_t time_window, int32_t height,
    int32_t* out_x, int32_t* out_y, int32_t* out_t, int8_t* out_p,
    int64_t capacity)
{
    // events are time-sorted: binary search the window bounds
    const int64_t* lo = std::lower_bound(t, t + n, t0);
    const int64_t* hi = std::lower_bound(lo, t + n, t1);
    int64_t i0 = lo - t, i1 = hi - t;
    if (i1 <= i0) return 0;
    // rebase against the last event that SURVIVES the y filter (the
    // reference filters first, dsec_data.py:125-128)
    int64_t t_last = 0;
    bool found = false;
    for (int64_t i = i1 - 1; i >= i0; --i) {
        if ((int32_t)y[i] < height) { t_last = t[i]; found = true; break; }
    }
    if (!found) return 0;
    int64_t m = 0;
    for (int64_t i = i0; i < i1 && m < capacity; ++i) {
        if ((int32_t)y[i] >= height) continue;
        out_x[m] = (int32_t)x[i];
        out_y[m] = (int32_t)y[i];
        out_t[m] = (int32_t)(time_window + t[i] - t_last);
        out_p[m] = (int8_t)(2 * (int32_t)p[i] - 1);
        ++m;
    }
    return m;
}

// Spatial 1/factor downsample with per-(pixel,polarity) refractory merge
// (scripts/downsample_events.py:108-123 semantics). Events must be
// time-sorted. Returns kept count.
int64_t downsample_filter(
    const uint16_t* x, const uint16_t* y, const int64_t* t,
    const uint8_t* p, int64_t n,
    int32_t factor, int32_t width_out, int32_t height_out,
    int64_t refractory_us,
    uint16_t* out_x, uint16_t* out_y, int64_t* out_t, uint8_t* out_p)
{
    int64_t cells = (int64_t)width_out * height_out * 2;
    int64_t* last = new int64_t[cells];
    std::fill(last, last + cells, INT64_MIN);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t xi = (int32_t)x[i] / factor;
        int32_t yi = (int32_t)y[i] / factor;
        if (xi >= width_out || yi >= height_out) continue;
        int64_t cell = ((int64_t)yi * width_out + xi) * 2 + (p[i] & 1);
        if (t[i] - last[cell] < refractory_us) continue;
        last[cell] = t[i];
        out_x[m] = (uint16_t)xi;
        out_y[m] = (uint16_t)yi;
        out_t[m] = t[i];
        out_p[m] = p[i];
        ++m;
    }
    delete[] last;
    return m;
}

// Polarity-balanced reservoir-free subsample to `target` events
// (augment.py:13-37 accumulator semantics): keeps a deterministic stride
// per polarity so the output preserves temporal order and polarity balance.
int64_t subsample_balanced(
    const int32_t* xi, const int32_t* yi, const int32_t* ti,
    const int8_t* pi, int64_t n, int64_t target,
    int32_t* out_x, int32_t* out_y, int32_t* out_t, int8_t* out_p)
{
    if (n <= target) {
        std::memcpy(out_x, xi, n * sizeof(int32_t));
        std::memcpy(out_y, yi, n * sizeof(int32_t));
        std::memcpy(out_t, ti, n * sizeof(int32_t));
        std::memcpy(out_p, pi, n * sizeof(int8_t));
        return n;
    }
    int64_t n_pos = 0;
    for (int64_t i = 0; i < n; ++i) n_pos += (pi[i] > 0);
    int64_t n_neg = n - n_pos;
    int64_t want_pos = std::min(n_pos, target / 2 + std::max<int64_t>(
        0, target / 2 - n_neg));
    int64_t want_neg = std::min(n_neg, target - want_pos);
    double acc_p = 0, acc_n = 0;
    double rate_p = n_pos ? (double)want_pos / n_pos : 0;
    double rate_n = n_neg ? (double)want_neg / n_neg : 0;
    int64_t m = 0;
    for (int64_t i = 0; i < n && m < target; ++i) {
        bool keep;
        if (pi[i] > 0) { acc_p += rate_p; keep = acc_p >= 1.0;
                         if (keep) acc_p -= 1.0; }
        else           { acc_n += rate_n; keep = acc_n >= 1.0;
                         if (keep) acc_n -= 1.0; }
        if (!keep) continue;
        out_x[m] = xi[i]; out_y[m] = yi[i];
        out_t[m] = ti[i]; out_p[m] = pi[i];
        ++m;
    }
    return m;
}

// Per-pixel recency rank: rank[i] = number of LATER events sharing pixel
// (x[i], y[i]) — the event's slot in the reference's per-pixel FIFO after
// the whole window is inserted (ev_graph.cu:169-212). One backward pass
// with a dense per-pixel counter table.
void queue_ranks(
    const int32_t* x, const int32_t* y, int64_t n,
    int32_t width, int32_t height, int32_t* rank_out)
{
    int64_t cells = (int64_t)width * height;
    int32_t* cnt = new int32_t[cells]();
    for (int64_t i = n - 1; i >= 0; --i) {
        int64_t c = (int64_t)y[i] * width + x[i];
        rank_out[i] = cnt[c]++;
    }
    delete[] cnt;
}

// Density-preserving zoom-out subsample: the reference's numba accumulator
// (src/dagr/data/augment.py:13-37) called on integer positions — which
// reduces to a per-pixel signed counter that emits an event when it crosses
// +-threshold (threshold = 1/zoom^2) and is then decremented by it. The
// count grid is (height+1)*(width+1) like the reference's. keep[i] is set
// when event i fires; events must be fed in stream order.
int64_t zoom_subsample(
    const int32_t* x, const int32_t* y, const int8_t* p, int64_t n,
    int32_t width, int32_t height, float threshold, uint8_t* keep)
{
    int64_t cells = (int64_t)(width + 1) * (height + 1);
    float* count = new float[cells]();
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
        keep[i] = 0;
        int32_t xi = x[i], yi = y[i];
        if (xi < 0 || xi > width || yi < 0 || yi > height) continue;
        int64_t c = (int64_t)yi * (width + 1) + xi;
        count[c] += (float)p[i];
        float pol = count[c] > 0.f ? 1.f : -1.f;
        if (pol * count[c] > threshold) {
            count[c] -= pol * threshold;
            keep[i] = 1;
            ++kept;
        }
    }
    delete[] count;
    return kept;
}

// Cascaded pooled-position tables (the parameter-independent half of voxel
// pooling, see eventad_tpu/data/pool_tables.py for the contract): per level
// accumulate [sum_x, sum_y, sum_t, count] over member nodes of each cell,
// in event order with f32 arithmetic — the same IEEE single ops the device
// path (ops/pooling.pool_graph) and the numpy oracle perform.
// pos: [n, 3] int32 (x, y, t_us) raw events; grids: [nlevels*2] (nx, ny);
// out: [sum_l nx*ny, 4] f32, levels concatenated.
void pool_tables(
    const int32_t* pos, const uint8_t* valid, int64_t n,
    int32_t width, int32_t height, int32_t time_window,
    const int32_t* grids, int32_t nlevels, float* out)
{
    const float clip_hi = 0.9999999f;
    const float eps = 1e-5f;
    const float denom[3] = {(float)width, (float)height,
                            (float)time_window};
    // normalized positions of the current level's nodes
    int64_t cap = n;
    for (int32_t l = 0; l < nlevels; ++l)
        cap = std::max(cap, (int64_t)grids[2 * l] * grids[2 * l + 1]);
    float* cur = new float[cap * 3];
    float* nxt = new float[cap * 3];
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        for (int k = 0; k < 3; ++k)
            cur[m * 3 + k] = (float)pos[i * 3 + k] / denom[k];
        ++m;
    }
    float* acc = out;
    for (int32_t l = 0; l < nlevels; ++l) {
        int32_t nx = grids[2 * l], ny = grids[2 * l + 1];
        int64_t cells = (int64_t)nx * ny;
        std::memset(acc, 0, cells * 4 * sizeof(float));
        for (int64_t i = 0; i < m; ++i) {
            float px = cur[i * 3 + 0], py = cur[i * 3 + 1];
            px = std::min(std::max(px, 0.f), clip_hi);
            py = std::min(std::max(py, 0.f), clip_hi);
            int64_t c = (int64_t)std::floor(py * (float)ny) * nx
                      + (int64_t)std::floor(px * (float)nx);
            acc[c * 4 + 0] += cur[i * 3 + 0];
            acc[c * 4 + 1] += cur[i * 3 + 1];
            acc[c * 4 + 2] += cur[i * 3 + 2];
            acc[c * 4 + 3] += 1.f;
        }
        // next level pools the pooled positions of active cells after the
        // same mean + pixel rounding the device applies
        int64_t mm = 0;
        for (int64_t c = 0; c < cells; ++c) {
            float cnt = acc[c * 4 + 3];
            if (!(cnt > 0.f)) continue;
            float inv = std::max(cnt, 1.f);
            float px = acc[c * 4 + 0] / inv;
            float py = acc[c * 4 + 1] / inv;
            float pt = acc[c * 4 + 2] / inv;
            nxt[mm * 3 + 0] =
                std::floor((px + eps) * (float)width) / (float)width;
            nxt[mm * 3 + 1] =
                std::floor((py + eps) * (float)height) / (float)height;
            nxt[mm * 3 + 2] = pt;
            ++mm;
        }
        std::swap(cur, nxt);
        m = mm;
        acc += cells * 4;
    }
    delete[] cur;
    delete[] nxt;
}

}  // extern "C"
