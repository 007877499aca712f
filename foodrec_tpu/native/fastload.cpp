// fastload: native host-side dataset runtime for foodrec-tpu.
//
// Replaces the two hottest pure-Python passes of the cold dataset load
// (measured at Foodcom scale: ~3.5s negative-file parsing + ~2.8s eval-set
// assembly out of a ~26s load):
//
//   * parse_negatives — ".negative" rows "(u:[pos..])\t n1 \t ... \t nK":
//     skips the first field, parses K ints per row straight out of the
//     file buffer (reference loader: FoodRec/utils/dataset.py:245-256)
//   * build_eval_set — per-user candidate rows [positives..., negatives
//     minus the first occurrence of each positive], padded to a static
//     width (reference feeder: FoodRec/utils/dataloader.py:232-238)
//
// Exposed as plain C symbols consumed via ctypes (no pybind11 in the image).
// Build: foodrec_tpu/native/__init__.py shells out to g++ on first use.

#include <cstdint>
#include <cstring>

extern "C" {

// Parse `rows` lines of a .negative buffer, K ints per line after the first
// tab-separated field. Returns number of rows parsed, or -1 on malformed
// input (fewer than K ints on a line).
long parse_negatives(const char* buf, long len, long rows, long k,
                     int32_t* out) {
    const char* p = buf;
    const char* end = buf + len;
    long r = 0;
    while (p < end && r < rows) {
        // skip the "(u:[...])" field up to the first tab
        while (p < end && *p != '\t' && *p != '\n') ++p;
        if (p >= end || *p == '\n') { ++p; continue; }  // empty line
        long c = 0;
        while (p < end && *p != '\n') {
            // skip separators
            while (p < end && (*p == '\t' || *p == ' ' || *p == '\r')) ++p;
            if (p >= end || *p == '\n') break;
            bool neg = (*p == '-');
            if (neg) ++p;
            long v = 0;
            bool got = false;
            while (p < end && *p >= '0' && *p <= '9') {
                v = v * 10 + (*p - '0');
                ++p;
                got = true;
            }
            if (!got) return -1;
            if (c < k) out[r * k + c] = (int32_t)(neg ? -v : v);
            ++c;
        }
        if (c != k) return -1;  // ragged row: caller falls back to python
        ++p;  // consume '\n'
        ++r;
    }
    return r;
}

// Assemble padded eval candidate rows.
//   pos_flat / pos_off : ragged positives per user (off[u]..off[u+1])
//   negs               : [U, K] negative ids
//   width              : padded row width (>= max n_cand)
// Outputs: cand [U, width] (0-padded), n_pos [U], n_cand [U].
void build_eval_set(const int32_t* pos_flat, const int64_t* pos_off, long U,
                    const int32_t* negs, long K, long width, int32_t* cand,
                    int32_t* n_pos, int32_t* n_cand) {
    for (long u = 0; u < U; ++u) {
        const int32_t* pos = pos_flat + pos_off[u];
        long np_ = pos_off[u + 1] - pos_off[u];
        int32_t* row = cand + u * width;
        long c = 0;
        for (long j = 0; j < np_; ++j) row[c++] = pos[j];
        // removed[j] marks positives whose first occurrence in the negative
        // list has already been dropped (dataloader.py:235-237)
        bool removed[4096];
        long nrem = np_ < 4096 ? np_ : 4096;
        memset(removed, 0, nrem);
        const int32_t* nrow = negs + u * K;
        for (long j = 0; j < K; ++j) {
            int32_t x = nrow[j];
            bool skip = false;
            for (long t = 0; t < nrem; ++t) {
                if (!removed[t] && pos[t] == x) {
                    removed[t] = true;
                    skip = true;
                    break;
                }
            }
            if (!skip) row[c++] = x;
        }
        n_pos[u] = (int32_t)np_;
        n_cand[u] = (int32_t)c;
        for (long j = c; j < width; ++j) row[j] = 0;
    }
}

// Pack per-user positive bitmaps: bit (u, i) set for each (u, i) pair.
// bitmap: [n_users, words] uint32, words = ceil(n_items / 32).
void pack_bitmap(const int64_t* users, const int64_t* items, long n,
                 long words, uint32_t* bitmap) {
    for (long j = 0; j < n; ++j) {
        int64_t u = users[j];
        int64_t i = items[j];
        bitmap[u * words + (i >> 5)] |= (uint32_t)1 << (i & 31);
    }
}

}  // extern "C"
