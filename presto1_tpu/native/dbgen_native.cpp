// Native host-side data-plane helpers.
//
// The reference engine's performance strategy is JVM bytecode generation;
// its host-side data plane (page serde, dbgen via io.trino.tpch) is Java.
// Here the TPU compute path is XLA, and the host-side loader hot spots —
// TPC-H text-column materialisation and dictionary encoding — are C++,
// exposed through a C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC dbgen_native.cpp -o libp1native.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

// Lehmer LCG (seed' = seed * 16807 mod 2^31-1) jump-ahead: fills
// out[i] = seed0 * 16807^(start+i)*usage + k+1) mod M for i in [0, n).
// Matches presto1_tpu/tpch/dbgen.py Stream.seeds().
void p1_lehmer_seeds(uint64_t seed0, uint64_t usage, uint64_t start,
                     uint64_t k, int64_t n, uint64_t* out) {
    const uint64_t M = 2147483647ULL;
    const uint64_t A = 16807ULL;
    // base seed for row `start`: seed0 * A^(start*usage + k + 1) mod M
    __uint128_t acc = 1;
    uint64_t e = start * usage + k + 1;
    uint64_t b = A;
    while (e) {
        if (e & 1) acc = (acc * b) % M;
        b = (uint64_t)(((__uint128_t)b * b) % M);
        e >>= 1;
    }
    uint64_t step = 1;  // A^usage mod M
    {
        __uint128_t s = 1;
        uint64_t bb = A, ee = usage;
        while (ee) {
            if (ee & 1) s = (s * bb) % M;
            bb = (uint64_t)(((__uint128_t)bb * bb) % M);
            ee >>= 1;
        }
        step = (uint64_t)s;
    }
    uint64_t cur = (uint64_t)(((__uint128_t)seed0 * (uint64_t)acc) % M);
    for (int64_t i = 0; i < n; i++) {
        out[i] = cur;
        cur = (uint64_t)(((__uint128_t)cur * step) % M);
    }
}

// Extract n substrings pool[off[i] .. off[i]+len[i]) into a packed arena.
// out_offsets has n+1 entries; returns total bytes written.
int64_t p1_text_extract(const char* pool, const int64_t* offsets,
                        const int64_t* lengths, int64_t n,
                        char* arena, int64_t* out_offsets) {
    int64_t pos = 0;
    for (int64_t i = 0; i < n; i++) {
        out_offsets[i] = pos;
        std::memcpy(arena + pos, pool + offsets[i], (size_t)lengths[i]);
        pos += lengths[i];
    }
    out_offsets[n] = pos;
    return pos;
}

// Dictionary-encode n strings (packed arena + offsets) into sorted-dict
// codes.  Returns the dictionary size.  codes[i] = rank of string i in the
// sorted distinct set; dict_index[r] = index of a row holding rank r's
// string (so the caller can materialise the dictionary without copies).
int64_t p1_dict_encode(const char* arena, const int64_t* offsets, int64_t n,
                       int32_t* codes, int64_t* dict_index) {
    std::unordered_map<std::string_view, int32_t> map;
    map.reserve((size_t)n * 2);
    std::vector<int64_t> first_row;
    first_row.reserve(1024);
    std::vector<int32_t> ids((size_t)n);
    for (int64_t i = 0; i < n; i++) {
        std::string_view sv(arena + offsets[i],
                            (size_t)(offsets[i + 1] - offsets[i]));
        auto [it, inserted] = map.try_emplace(sv, (int32_t)first_row.size());
        if (inserted) first_row.push_back(i);
        ids[(size_t)i] = it->second;
    }
    const int64_t d = (int64_t)first_row.size();
    // sort distinct ids by string value -> rank
    std::vector<int32_t> perm((size_t)d);
    std::iota(perm.begin(), perm.end(), 0);
    std::sort(perm.begin(), perm.end(), [&](int32_t a, int32_t b) {
        std::string_view sa(arena + offsets[first_row[(size_t)a]],
                            (size_t)(offsets[first_row[(size_t)a] + 1]
                                     - offsets[first_row[(size_t)a]]));
        std::string_view sb(arena + offsets[first_row[(size_t)b]],
                            (size_t)(offsets[first_row[(size_t)b] + 1]
                                     - offsets[first_row[(size_t)b]]));
        return sa < sb;
    });
    std::vector<int32_t> rank((size_t)d);
    for (int64_t r = 0; r < d; r++) {
        rank[(size_t)perm[(size_t)r]] = (int32_t)r;
        dict_index[r] = first_row[(size_t)perm[(size_t)r]];
    }
    for (int64_t i = 0; i < n; i++) codes[i] = rank[(size_t)ids[(size_t)i]];
    return d;
}

}  // extern "C"
