// Native host-path kernels for semanticsearch_tpu, exposed via ctypes.
//
// The TPU does the FLOPs; these C++ routines keep the single host core from
// becoming the bottleneck on the string-heavy paths the reference spent
// process pools on (SURVEY.md §2b): hashing tokenization feeding the encoder
// (replaces per-token Python hashing in models/tokenizer.py) and batched BM25
// scoring over CSR term stats (replaces the per-doc Python loop in
// index/bm25.py; the reference used the rank_bm25 C-free package,
// Tool/rank_chunks_optimized.py:219-222).
//
// Build: make -C semanticsearch_tpu/native
// ABI: plain C functions; all buffers caller-allocated numpy arrays.

#include <cstdint>
#include <cstring>
#include <cctype>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// FNV-1a 64-bit hashing tokenizer.
//
// Tokenization contract (must match models/tokenizer.py::_TOKEN_RE):
// lowercase; tokens are maximal runs of [a-z0-9]; each token hashes to
// 3 + (fnv1a64(token) % (vocab_size - 3)); optional CLS id 1 prepended;
// output padded with 0 to max_len.
// ---------------------------------------------------------------------------

static inline uint64_t fnv1a64(const unsigned char* data, int64_t len) {
    uint64_t h = 0xCBF29CE484222325ULL;
    for (int64_t i = 0; i < len; ++i) {
        h ^= (uint64_t)data[i];
        h *= 0x100000001B3ULL;
    }
    return h;
}

// texts: UTF-8 bytes of all texts concatenated; offsets: (n_texts+1) int64
// boundaries into `texts`. Writes ids/mask as (n_texts, max_len) int32
// row-major. Non-ASCII bytes are treated as separators (the Python regex
// tokenizer only admits [a-z0-9], so behavior matches for ASCII; non-ASCII
// letters are dropped by both).
void hash_tokenize_batch(
    const unsigned char* texts,
    const int64_t* offsets,
    int64_t n_texts,
    int32_t vocab_size,
    int32_t max_len,
    int32_t add_cls,
    int32_t* ids_out,
    int32_t* mask_out) {
    const uint64_t space = (uint64_t)(vocab_size - 3);
    for (int64_t t = 0; t < n_texts; ++t) {
        const unsigned char* s = texts + offsets[t];
        const int64_t len = offsets[t + 1] - offsets[t];
        int32_t* ids = ids_out + t * max_len;
        int32_t* mask = mask_out + t * max_len;
        std::memset(ids, 0, sizeof(int32_t) * max_len);
        std::memset(mask, 0, sizeof(int32_t) * max_len);
        int32_t pos = 0;
        if (add_cls && pos < max_len) {
            ids[pos] = 1;  // CLS_ID
            mask[pos] = 1;
            ++pos;
        }
        unsigned char buf[256];
        int blen = 0;
        for (int64_t i = 0; i <= len && pos < max_len; ++i) {
            unsigned char c = (i < len) ? s[i] : (unsigned char)' ';
            if (c >= 'A' && c <= 'Z') c = (unsigned char)(c - 'A' + 'a');
            const bool ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9');
            if (ok) {
                if (blen < (int)sizeof(buf)) buf[blen++] = c;
            } else if (blen > 0) {
                const uint64_t h = fnv1a64(buf, blen);
                ids[pos] = (int32_t)(3 + (h % space));
                mask[pos] = 1;
                ++pos;
                blen = 0;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Batched BM25 Okapi scoring over CSR document term statistics.
//
// Scoring contract matches index/bm25.py::BM25Okapi.get_scores_batch:
// score(q, d) = sum_{t in q∩d} w_q[t] * idf[t] * tf * (k1+1) / (tf + norm[d])
// with norm[d] = k1 * (1 - b + b * dl[d] / avgdl) and w_q[t] the term's
// occurrence count in the query (rank_bm25 accumulates once per occurrence).
// idf precomputed by caller.
// ---------------------------------------------------------------------------

void bm25_score_batch(
    const int64_t* doc_indptr,    // (n_docs+1)
    const int64_t* doc_termids,   // (nnz)
    const float* doc_tf,          // (nnz)
    const float* idf,             // (n_terms)
    const float* norm,            // (n_docs): k1*(1-b+b*dl/avgdl)
    int64_t n_docs,
    const int64_t* q_indptr,      // (n_queries+1) into q_termids
    const int64_t* q_termids,     // (q_nnz) sorted unique term ids per query
    const float* q_weights,       // (q_nnz) occurrence count per query term
    int64_t n_queries,
    float k1,
    float* scores_out) {          // (n_queries, n_docs) row-major
    std::memset(scores_out, 0, sizeof(float) * (size_t)n_queries * n_docs);
    for (int64_t d = 0; d < n_docs; ++d) {
        const int64_t s = doc_indptr[d], e = doc_indptr[d + 1];
        const float nd = norm[d];
        for (int64_t q = 0; q < n_queries; ++q) {
            const int64_t qs = q_indptr[q], qe = q_indptr[q + 1];
            // merge-join the sorted doc term list with the sorted query list
            int64_t i = s, j = qs;
            float acc = 0.0f;
            while (i < e && j < qe) {
                const int64_t td = doc_termids[i];
                const int64_t tq = q_termids[j];
                if (td < tq) ++i;
                else if (td > tq) ++j;
                else {
                    const float f = doc_tf[i];
                    acc += q_weights[j] * idf[td] * f * (k1 + 1.0f) / (f + nd);
                    ++i; ++j;
                }
            }
            scores_out[q * n_docs + d] += acc;
        }
    }
}

// ---------------------------------------------------------------------------
// Serve-time BM25 top-k over an inverted index (term-major postings),
// threaded across queries. Matches index/bm25.py::BM25Okapi.get_topk's
// sparse-path semantics exactly: touched docs ranked by (-score, doc id);
// when fewer than k docs match, filled with the lowest ids in [0, k) not
// already selected (score 0). Per-query cost is O(sum_t df(t) +
// touched * log k), never O(n_docs).
//
// Each thread owns an acc (f32, n_docs) + seen (u8, n_docs) scratch —
// ~5 bytes * n_docs per thread; cap n_threads accordingly at 10M docs.
// ---------------------------------------------------------------------------

static void bm25_topk_range(
    const int64_t* inv_indptr, const int64_t* inv_docs, const float* inv_tf,
    const float* idf, const float* norm, int64_t n_docs,
    const int64_t* q_indptr, const int64_t* q_termids, const float* q_weights,
    float k1, int32_t k,
    int64_t q_begin, int64_t q_end,
    int64_t* idx_out, float* scores_out) {
    std::vector<float> acc((size_t)n_docs, 0.0f);
    std::vector<uint8_t> seen((size_t)n_docs, 0);
    std::vector<int64_t> touched;
    touched.reserve(4096);
    for (int64_t q = q_begin; q < q_end; ++q) {
        touched.clear();
        for (int64_t j = q_indptr[q]; j < q_indptr[q + 1]; ++j) {
            const int64_t t = q_termids[j];
            const float w = q_weights[j] * idf[t] * (k1 + 1.0f);
            for (int64_t p = inv_indptr[t]; p < inv_indptr[t + 1]; ++p) {
                const int64_t d = inv_docs[p];
                const float f = inv_tf[p];
                acc[d] += w * f / (f + norm[d]);
                if (!seen[d]) {
                    seen[d] = 1;
                    touched.push_back(d);
                }
            }
        }
        // rank touched by (-score, doc id); touched ids are NOT sorted, so
        // the comparator breaks score ties by id explicitly
        const int64_t kk = std::min<int64_t>(k, n_docs);
        const int64_t top = std::min<int64_t>(kk, (int64_t)touched.size());
        auto by_score = [&acc](int64_t a, int64_t b) {
            if (acc[a] != acc[b]) return acc[a] > acc[b];
            return a < b;
        };
        std::partial_sort(touched.begin(), touched.begin() + top,
                          touched.end(), by_score);
        int64_t* idx = idx_out + q * k;
        float* sc = scores_out + q * k;
        int64_t pos = 0;
        for (; pos < top; ++pos) {
            idx[pos] = touched[pos];
            sc[pos] = acc[touched[pos]];
        }
        // fill with the lowest ids in [0, kk) not already selected (score 0)
        for (int64_t d = 0; pos < kk && d < n_docs; ++d) {
            bool taken = false;
            for (int64_t i = 0; i < top; ++i) {
                if (idx[i] == d) { taken = true; break; }
            }
            if (!taken) {
                idx[pos] = d;
                sc[pos] = 0.0f;
                ++pos;
            }
        }
        for (; pos < k; ++pos) {  // k > n_docs: pad deterministically
            idx[pos] = 0;
            sc[pos] = 0.0f;
        }
        for (int64_t d : touched) {
            acc[d] = 0.0f;
            seen[d] = 0;
        }
    }
}

void bm25_topk_batch(
    const int64_t* inv_indptr,    // (n_terms+1) postings boundaries
    const int64_t* inv_docs,      // (nnz) doc ids, term-major
    const float* inv_tf,          // (nnz) term frequencies
    const float* idf,             // (n_terms)
    const float* norm,            // (n_docs): k1*(1-b+b*dl/avgdl)
    int64_t n_docs,
    const int64_t* q_indptr,      // (n_queries+1)
    const int64_t* q_termids,     // (q_nnz) unique term ids per query
    const float* q_weights,       // (q_nnz) occurrence counts
    int64_t n_queries,
    float k1,
    int32_t k,
    int32_t n_threads,
    int64_t* idx_out,             // (n_queries, k)
    float* scores_out) {          // (n_queries, k)
    int64_t nt = n_threads > 0 ? n_threads : 1;
    nt = std::min<int64_t>(nt, n_queries > 0 ? n_queries : 1);
    if (nt <= 1) {
        bm25_topk_range(inv_indptr, inv_docs, inv_tf, idf, norm, n_docs,
                        q_indptr, q_termids, q_weights, k1, k,
                        0, n_queries, idx_out, scores_out);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve((size_t)nt);
    const int64_t per = (n_queries + nt - 1) / nt;
    for (int64_t t = 0; t < nt; ++t) {
        const int64_t b = t * per;
        const int64_t e = std::min(n_queries, b + per);
        if (b >= e) break;
        threads.emplace_back(
            bm25_topk_range, inv_indptr, inv_docs, inv_tf, idf, norm, n_docs,
            q_indptr, q_termids, q_weights, k1, k, b, e, idx_out, scores_out);
    }
    for (auto& th : threads) th.join();
}

int32_t semsearch_native_abi_version() { return 3; }

}  // extern "C"
