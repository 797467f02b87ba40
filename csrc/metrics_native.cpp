// Native scoring kernels for the eval harness.
//
// The reference's only native code is a CUDA cache-append kernel
// (/root/reference/csrc/csrc/cuda_api.cu) whose TPU-side equivalent is the
// Pallas kernel suite in pyramidkv_tpu/kernels/.  This module is the
// native layer for the HOST side of the framework: the eval scorers that
// dominate wall-clock when aggregating tens of thousands of predictions
// (O(n*m) Levenshtein / LCS dynamic programs are ~100x slower in pure
// Python).  Exposed through a plain C ABI and loaded via ctypes
// (pyramidkv_tpu/native.py) — no pybind11 dependency, graceful Python
// fallback when the .so is absent.
//
// Build: `make -C csrc` (see csrc/Makefile).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Decode UTF-8 into code points so edit distances count characters, not
// bytes (parity with Python string semantics).
std::vector<uint32_t> utf8_decode(const char* s, int64_t len) {
    std::vector<uint32_t> out;
    out.reserve(static_cast<size_t>(len));
    const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
    int64_t i = 0;
    while (i < len) {
        uint32_t cp = p[i];
        int extra = 0;
        if (cp >= 0xF0) { cp &= 0x07; extra = 3; }
        else if (cp >= 0xE0) { cp &= 0x0F; extra = 2; }
        else if (cp >= 0xC0) { cp &= 0x1F; extra = 1; }
        ++i;
        for (int k = 0; k < extra && i < len; ++k, ++i) {
            cp = (cp << 6) | (p[i] & 0x3F);
        }
        out.push_back(cp);
    }
    return out;
}

}  // namespace

extern "C" {

// Levenshtein similarity ratio with substitution cost 2 (the
// python-Levenshtein formula behind fuzz.ratio; see
// pyramidkv_tpu/evalsuite/metrics.py::levenshtein_ratio).
// Returns ratio in [0, 1].
double pkv_levenshtein_ratio(const char* a, int64_t alen,
                             const char* b, int64_t blen) {
    std::vector<uint32_t> ua = utf8_decode(a, alen);
    std::vector<uint32_t> ub = utf8_decode(b, blen);
    const int64_t la = static_cast<int64_t>(ua.size());
    const int64_t lb = static_cast<int64_t>(ub.size());
    if (la + lb == 0) return 1.0;
    // insert/delete cost 1, substitution cost 2 (python-Levenshtein)
    std::vector<int64_t> prev(lb + 1), cur(lb + 1);
    for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
    for (int64_t i = 1; i <= la; ++i) {
        cur[0] = i;
        const uint32_t ai = ua[i - 1];
        for (int64_t j = 1; j <= lb; ++j) {
            const int64_t sub = prev[j - 1] + (ai == ub[j - 1] ? 0 : 2);
            cur[j] = std::min({sub, prev[j] + 1, cur[j - 1] + 1});
        }
        std::swap(prev, cur);
    }
    const int64_t dist = prev[lb];
    // banker's-rounded integer percentage (Python round()) / 100
    const double r = static_cast<double>(la + lb - dist) /
                     static_cast<double>(la + lb);
    return std::nearbyint(r * 100.0) / 100.0;
}

// ROUGE-L F1 over pre-tokenized sequences (token ids as int32 arrays):
// LCS-based recall/precision harmonic mean.  Tokenisation happens in
// Python (language-specific); the O(n*m) LCS table is the hot part.
double pkv_rouge_l_f1(const int32_t* a, int64_t la,
                      const int32_t* b, int64_t lb) {
    if (la == 0 || lb == 0) return 0.0;
    std::vector<int32_t> prev(lb + 1, 0), cur(lb + 1, 0);
    for (int64_t i = 1; i <= la; ++i) {
        for (int64_t j = 1; j <= lb; ++j) {
            if (a[i - 1] == b[j - 1]) cur[j] = prev[j - 1] + 1;
            else cur[j] = std::max(prev[j], cur[j - 1]);
        }
        std::swap(prev, cur);
        std::fill(cur.begin(), cur.end(), 0);
    }
    const double lcs = static_cast<double>(prev[lb]);
    if (lcs == 0.0) return 0.0;
    const double p = lcs / static_cast<double>(la);
    const double r = lcs / static_cast<double>(lb);
    return 2.0 * p * r / (p + r);
}

// RULER string_match_all inner loop: case-insensitive substring containment
// counts.  preds/refs are flattened \x1f-separated UTF-8 blobs to keep the
// ABI to plain byte buffers.
// Returns sum over examples of (matched refs / num refs); caller divides by
// n and scales by 100 (metrics.py:146-153).
double pkv_string_match_all(const char* preds_blob, int64_t preds_len,
                            const char* refs_blob, int64_t refs_len) {
    auto lower = [](std::string s) {
        std::transform(s.begin(), s.end(), s.begin(),
                       [](unsigned char c) { return std::tolower(c); });
        return s;
    };
    auto split = [](const char* blob, int64_t len, char sep) {
        std::vector<std::string> out;
        std::string curs;
        for (int64_t i = 0; i < len; ++i) {
            if (blob[i] == sep) { out.push_back(curs); curs.clear(); }
            else curs.push_back(blob[i]);
        }
        out.push_back(curs);
        return out;
    };
    // preds: one per example (sep \x1f); refs: examples sep \x1e, refs
    // within an example sep \x1f
    std::vector<std::string> preds = split(preds_blob, preds_len, '\x1f');
    std::vector<std::string> ref_groups = split(refs_blob, refs_len, '\x1e');
    const size_t n = std::min(preds.size(), ref_groups.size());
    double total = 0.0;
    for (size_t i = 0; i < n; ++i) {
        const std::string pl = lower(preds[i]);
        std::vector<std::string> refs =
            split(ref_groups[i].data(),
                  static_cast<int64_t>(ref_groups[i].size()), '\x1f');
        if (refs.empty()) continue;
        double hit = 0.0;
        for (const auto& rraw : refs) {
            if (pl.find(lower(rraw)) != std::string::npos) hit += 1.0;
        }
        total += hit / static_cast<double>(refs.size());
    }
    return total;
}

// Token-multiset F1 (qa_f1 core, metrics.py:117-127) over pre-hashed
// token ids; counts multiset intersection.
double pkv_token_f1(const int32_t* a, int64_t la,
                    const int32_t* b, int64_t lb) {
    if (la == 0 || lb == 0) return 0.0;
    std::vector<int32_t> sa(a, a + la), sb(b, b + lb);
    std::sort(sa.begin(), sa.end());
    std::sort(sb.begin(), sb.end());
    int64_t same = 0, i = 0, j = 0;
    while (i < la && j < lb) {
        if (sa[i] == sb[j]) { ++same; ++i; ++j; }
        else if (sa[i] < sb[j]) ++i;
        else ++j;
    }
    if (same == 0) return 0.0;
    const double p = static_cast<double>(same) / static_cast<double>(la);
    const double r = static_cast<double>(same) / static_cast<double>(lb);
    return 2.0 * p * r / (p + r);
}

}  // extern "C"
