// Single-core CPU BM25 engine: the baseline stand-in for the Rust
// reference engine (no cargo toolchain exists in this sandbox — see
// BASELINE.md addendum). Implements the same three execution
// strategies the reference exposes (searchlite-core/src/query/wand.rs:
// bm25 brute / WAND / block-max WAND), written from the published
// algorithms, over the same postings this framework indexes:
//
//   - mode 0 "bm25":  term-at-a-time accumulation with epoch-stamped
//     accumulators + candidate list, heap top-k.
//   - mode 1 "wand":  doc-at-a-time pivot loop with per-term upper
//     bounds (Broder et al. 2003).
//   - mode 2 "bmw":   WAND + per-128-block max impacts used for
//     shallow bound refinement and block skips (Ding & Suel 2011;
//     the reference's block size is also 128, postings.rs:11).
//
// Scores match the engine's device path exactly: BM25 with
// query-independent impact precomputed per posting, score = idf *
// impact summed over matching terms; top-k ties resolve (score desc,
// doc asc). Single-threaded by design: the baseline unit is QPS per
// CPU core (the reference engine executes one query on one core).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Engine {
    int n_docs = 0;
    int n_terms = 0;
    std::vector<int64_t> base;      // [n_terms+1] posting offsets
    std::vector<int32_t> docs;      // [P]
    std::vector<float> impacts;     // [P] tf-saturation * length norm
    std::vector<float> term_max;    // [n_terms] max impact
    // per-term block tables (128-wide, relative to the term's base)
    std::vector<int64_t> blk_base;  // [n_terms+1] block offsets
    std::vector<float> blk_max;     // [n_blocks]
    std::vector<int32_t> blk_last;  // [n_blocks] last doc in block
    double k1 = 0.9, b = 0.4;
    // reusable per-query state (engine is single-threaded)
    std::vector<float> acc;
    std::vector<int32_t> epoch;
    std::vector<int32_t> touched;
    int32_t cur_epoch = 0;
};

constexpr int kBlock = 128;

struct Cursor {
    const int32_t* docs;
    const float* imps;
    int64_t len;
    int64_t pos;
    float ub;          // idf * term_max
    float idf;
    // block tables for bmw
    const float* bmax;
    const int32_t* blast;
    int64_t n_blocks;
    int32_t doc() const { return pos < len ? docs[pos] : INT32_MAX; }
};

struct Hit {
    float score;
    int32_t doc;
};

// heap orders WORST hit first: score asc, doc desc (so replacing the
// top keeps the best (score desc, doc asc) set)
inline bool worse(const Hit& a, const Hit& b) {
    if (a.score != b.score) return a.score > b.score;
    return a.doc < b.doc;
}

inline void heap_push(std::vector<Hit>& h, Hit v, size_t k) {
    if (h.size() < k) {
        h.push_back(v);
        std::push_heap(h.begin(), h.end(), worse);
    } else if (worse(v, h.front())) {  // v strictly better than worst
        std::pop_heap(h.begin(), h.end(), worse);
        h.back() = v;
        std::push_heap(h.begin(), h.end(), worse);
    }
}

inline float theta(const std::vector<Hit>& h, size_t k) {
    return h.size() < k ? -1.0f : h.front().score;
}

// galloping advance to the first pos with docs[pos] >= target
inline void advance_to(Cursor& c, int32_t target) {
    int64_t lo = c.pos, step = 1;
    if (lo >= c.len || c.docs[lo] >= target) return;
    int64_t hi = lo + step;
    while (hi < c.len && c.docs[hi] < target) {
        lo = hi;
        step <<= 1;
        hi = lo + step;
    }
    if (hi > c.len) hi = c.len;
    c.pos = std::lower_bound(c.docs + lo, c.docs + hi, target) - c.docs;
}

int emit(std::vector<Hit>& heap, int32_t* out_ids, float* out_scores) {
    std::sort(heap.begin(), heap.end(), [](const Hit& a, const Hit& b) {
        if (a.score != b.score) return a.score > b.score;
        return a.doc < b.doc;
    });
    for (size_t i = 0; i < heap.size(); i++) {
        out_ids[i] = heap[i].doc;
        out_scores[i] = heap[i].score;
    }
    return static_cast<int>(heap.size());
}

int search_taat(Engine* e, const int32_t* tids, int nq, int k,
                int32_t* out_ids, float* out_scores) {
    if (++e->cur_epoch == 0) {  // epoch wrap: reset stamps
        std::fill(e->epoch.begin(), e->epoch.end(), -1);
        e->cur_epoch = 1;
    }
    e->touched.clear();
    const double live = e->n_docs;
    for (int t = 0; t < nq; t++) {
        int32_t tid = tids[t];
        if (tid < 0 || tid >= e->n_terms) continue;
        int64_t lo = e->base[tid], hi = e->base[tid + 1];
        double df = static_cast<double>(hi - lo);
        float idf = static_cast<float>(
            std::max(std::log((live - df + 0.5) / (df + 0.5)), 0.0) + 1.0);
        for (int64_t p = lo; p < hi; p++) {
            int32_t d = e->docs[p];
            if (e->epoch[d] != e->cur_epoch) {
                e->epoch[d] = e->cur_epoch;
                e->acc[d] = 0.0f;
                e->touched.push_back(d);
            }
            e->acc[d] += idf * e->impacts[p];
        }
    }
    std::vector<Hit> heap;
    heap.reserve(k + 1);
    for (int32_t d : e->touched) heap_push(heap, {e->acc[d], d}, k);
    return emit(heap, out_ids, out_scores);
}

int search_wand(Engine* e, const int32_t* tids, int nq, int k, bool bmw,
                int32_t* out_ids, float* out_scores) {
    const double live = e->n_docs;
    std::vector<Cursor> cur;
    cur.reserve(nq);
    for (int t = 0; t < nq; t++) {
        int32_t tid = tids[t];
        if (tid < 0 || tid >= e->n_terms) continue;
        int64_t lo = e->base[tid], hi = e->base[tid + 1];
        if (lo == hi) continue;
        double df = static_cast<double>(hi - lo);
        float idf = static_cast<float>(
            std::max(std::log((live - df + 0.5) / (df + 0.5)), 0.0) + 1.0);
        Cursor c;
        c.docs = e->docs.data() + lo;
        c.imps = e->impacts.data() + lo;
        c.len = hi - lo;
        c.pos = 0;
        c.idf = idf;
        c.ub = idf * e->term_max[tid];
        c.bmax = e->blk_max.data() + e->blk_base[tid];
        c.blast = e->blk_last.data() + e->blk_base[tid];
        c.n_blocks = e->blk_base[tid + 1] - e->blk_base[tid];
        cur.push_back(c);
    }
    std::vector<Hit> heap;
    heap.reserve(k + 1);
    std::vector<int> order(cur.size());
    for (size_t i = 0; i < cur.size(); i++) order[i] = static_cast<int>(i);

    while (true) {
        // sort cursor order by current doc
        std::sort(order.begin(), order.end(), [&](int a, int bix) {
            return cur[a].doc() < cur[bix].doc();
        });
        if (cur.empty() || cur[order[0]].doc() == INT32_MAX) break;
        float th = theta(heap, k);
        // find pivot: smallest prefix of cursors whose UB sum > theta
        float ub_sum = 0.0f;
        int pivot = -1;
        for (size_t i = 0; i < order.size(); i++) {
            if (cur[order[i]].doc() == INT32_MAX) break;
            ub_sum += cur[order[i]].ub;
            if (ub_sum > th) {
                pivot = static_cast<int>(i);
                break;
            }
        }
        if (pivot < 0) break;  // no doc can beat theta
        int32_t pivot_doc = cur[order[pivot]].doc();
        // extend the prefix over every cursor tied at pivot_doc: the
        // shallow bound below must cover ALL of pivot_doc's postings,
        // and the skip target must then be strictly past pivot_doc
        while (pivot + 1 < static_cast<int>(order.size()) &&
               cur[order[pivot + 1]].doc() == pivot_doc)
            pivot++;

        if (bmw) {
            // shallow bound: per-block maxes at pivot_doc
            float block_ub = 0.0f;
            int32_t next_boundary = INT32_MAX;
            for (int i = 0; i <= pivot; i++) {
                Cursor& c = cur[order[i]];
                if (c.doc() == INT32_MAX) continue;
                int64_t blk = c.pos / kBlock;
                // advance the BLOCK view to the one containing pivot_doc
                while (blk < c.n_blocks && c.blast[blk] < pivot_doc) blk++;
                if (blk < c.n_blocks) {
                    block_ub += c.idf * c.bmax[blk];
                    next_boundary =
                        std::min(next_boundary, c.blast[blk]);
                }
            }
            if (block_ub <= th && th >= 0.0f) {
                // no doc in [pivot_doc, boundary] can qualify — but the
                // bound only covers the prefix cursors, so the skip
                // must stop at the NEXT cursor's current doc (its lists
                // contribute from there on; Ding & Suel's candidate
                // selection)
                int32_t d_next =
                    (pivot + 1 < static_cast<int>(order.size()))
                        ? cur[order[pivot + 1]].doc()
                        : INT32_MAX;
                int32_t target = (next_boundary == INT32_MAX)
                                     ? pivot_doc + 1
                                     : next_boundary + 1;
                if (d_next < target) target = d_next;
                if (target <= pivot_doc) target = pivot_doc + 1;
                for (int i = 0; i <= pivot; i++)
                    advance_to(cur[order[i]], target);
                continue;
            }
        }

        if (cur[order[0]].doc() == pivot_doc) {
            // fully score pivot_doc
            float score = 0.0f;
            for (auto& c : cur) {
                if (c.doc() == pivot_doc) {
                    score += c.idf * c.imps[c.pos];
                    c.pos++;
                }
            }
            heap_push(heap, {score, pivot_doc}, k);
        } else {
            // advance the highest-df pre-pivot cursor (fewest skips
            // lost): advance the first, standard WAND choice
            advance_to(cur[order[0]], pivot_doc);
        }
    }
    return emit(heap, out_ids, out_scores);
}

}  // namespace

extern "C" {

void* slt_eng_new(int n_docs, int n_terms, const int64_t* posting_base,
                  const int32_t* docs, const float* tfs,
                  const float* doc_len, double avgdl, double k1,
                  double b) {
    Engine* e = new Engine();
    e->n_docs = n_docs;
    e->n_terms = n_terms;
    e->k1 = k1;
    e->b = b;
    int64_t P = posting_base[n_terms];
    e->base.assign(posting_base, posting_base + n_terms + 1);
    e->docs.assign(docs, docs + P);
    e->impacts.resize(P);
    e->term_max.assign(n_terms, 0.0f);
    e->blk_base.resize(n_terms + 1);
    // impacts + per-term/per-block maxima in one pass
    for (int t = 0; t < n_terms; t++) {
        e->blk_base[t + 1] =
            e->blk_base[t] + (e->base[t + 1] - e->base[t] + kBlock - 1) / kBlock;
    }
    e->blk_max.assign(e->blk_base[n_terms], 0.0f);
    e->blk_last.assign(e->blk_base[n_terms], INT32_MAX);
    for (int t = 0; t < n_terms; t++) {
        int64_t lo = e->base[t], hi = e->base[t + 1];
        for (int64_t p = lo; p < hi; p++) {
            double dl = doc_len[docs[p]];
            double norm = avgdl > 0 ? dl / avgdl : 1.0;
            double tf = tfs[p];
            double denom = tf + k1 * (1.0 - b + b * norm);
            float imp = static_cast<float>(
                tf * (k1 + 1.0) / (denom < 1e-6 ? 1e-6 : denom));
            e->impacts[p] = imp;
            if (imp > e->term_max[t]) e->term_max[t] = imp;
            int64_t blk = e->blk_base[t] + (p - lo) / kBlock;
            if (imp > e->blk_max[blk]) e->blk_max[blk] = imp;
            e->blk_last[blk] = docs[p];
        }
    }
    e->acc.assign(n_docs, 0.0f);
    e->epoch.assign(n_docs, -1);
    e->touched.reserve(1 << 16);
    return e;
}

void slt_eng_free(void* h) { delete static_cast<Engine*>(h); }

int slt_eng_search(void* h, const int32_t* tids, int n_terms, int k,
                   int mode, int32_t* out_ids, float* out_scores) {
    Engine* e = static_cast<Engine*>(h);
    if (mode == 0) return search_taat(e, tids, n_terms, k, out_ids,
                                      out_scores);
    return search_wand(e, tids, n_terms, k, mode == 2, out_ids,
                       out_scores);
}

// batch entry point so the timing loop crosses the ctypes boundary
// once: queries are a flat [n_queries * terms_per_query] tid array
// (tid -1 = missing term). Returns total results written.
int64_t slt_eng_search_batch(void* h, const int32_t* qtids,
                             int n_queries, int terms_per_query, int k,
                             int mode, int32_t* out_ids,
                             float* out_scores) {
    int64_t total = 0;
    for (int q = 0; q < n_queries; q++) {
        int n = slt_eng_search(h, qtids + (int64_t)q * terms_per_query,
                               terms_per_query, k, mode,
                               out_ids + (int64_t)q * k,
                               out_scores + (int64_t)q * k);
        for (int i = n; i < k; i++) {
            out_ids[(int64_t)q * k + i] = -1;
            out_scores[(int64_t)q * k + i] = -1.0f;
        }
        total += n;
    }
    return total;
}

}  // extern "C"
