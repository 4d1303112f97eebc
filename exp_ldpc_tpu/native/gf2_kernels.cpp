// Bit-packed GF(2) elimination kernels.
//
// Native backend for exp_ldpc_tpu.utils.gf2 (the framework's replacement for
// the galois/numba dependency of the reference, SURVEY.md §2.3): the O(n^3)
// homology behind logical-operator computation and the per-shot OSD
// eliminations run here.  Matrices are row-major uint64 words, 64 columns per
// word, little-endian bit order (matching gf2.pack_rows).
//
// Build: g++ -O3 -march=native -shared -fPIC (driven by exp_ldpc_tpu.native).
#include <cstdint>
#include <cstring>

extern "C" {

// In-place reduced row echelon form over the first `reduce_cols` columns.
// data: rows x words packed matrix.  pivots_out: capacity >= min(rows, reduce_cols).
// Returns the number of pivots (rank over the reduced column range).
long long gf2_row_reduce(uint64_t* data, long long rows, long long words,
                         long long reduce_cols, long long* pivots_out) {
    long long pr = 0;  // pivot row
    for (long long col = 0; col < reduce_cols && pr < rows; ++col) {
        const long long w = col >> 6;
        const uint64_t bit = 1ULL << (col & 63);
        // find pivot
        long long src = -1;
        for (long long r = pr; r < rows; ++r) {
            if (data[r * words + w] & bit) { src = r; break; }
        }
        if (src < 0) continue;
        if (src != pr) {
            for (long long k = w; k < words; ++k) {
                uint64_t t = data[pr * words + k];
                data[pr * words + k] = data[src * words + k];
                data[src * words + k] = t;
            }
        }
        // eliminate all other rows holding this column
        const uint64_t* prow = data + pr * words;
        for (long long r = 0; r < rows; ++r) {
            if (r == pr) continue;
            if (data[r * words + w] & bit) {
                uint64_t* rrow = data + r * words;
                for (long long k = w; k < words; ++k) rrow[k] ^= prow[k];
            }
        }
        pivots_out[pr] = col;
        ++pr;
    }
    return pr;
}

// rank only (destroys data)
long long gf2_rank(uint64_t* data, long long rows, long long words, long long cols) {
    long long pr = 0;
    for (long long col = 0; col < cols && pr < rows; ++col) {
        const long long w = col >> 6;
        const uint64_t bit = 1ULL << (col & 63);
        long long src = -1;
        for (long long r = pr; r < rows; ++r) {
            if (data[r * words + w] & bit) { src = r; break; }
        }
        if (src < 0) continue;
        if (src != pr) {
            for (long long k = w; k < words; ++k) {
                uint64_t t = data[pr * words + k];
                data[pr * words + k] = data[src * words + k];
                data[src * words + k] = t;
            }
        }
        const uint64_t* prow = data + pr * words;
        for (long long r = pr + 1; r < rows; ++r) {
            if (data[r * words + w] & bit) {
                uint64_t* rrow = data + r * words;
                for (long long k = w; k < words; ++k) rrow[k] ^= prow[k];
            }
        }
        ++pr;
    }
    return pr;
}

}  // extern "C"
