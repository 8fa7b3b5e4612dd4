// acg_native — native helpers for the acg_tpu framework.
//
// TPU-native re-expression of the reference's performance-critical host
// code: the Matrix Market text parser (the reference's largest module,
// acg/mtxfile.c, parses line-by-line in C) and the METIS-style graph
// partitioner (acg/metis.c wraps METIS recursive bisection / k-way).
//
// Exposed through a plain C ABI and loaded from Python with ctypes
// (no pybind11 in the image).  Pure-Python fallbacks exist for every
// function here; this library is a fast path, not a requirement.
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <cmath>
#include <algorithm>
#include <queue>
#include <random>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Fast Matrix Market coordinate-data parser.
//
// Parses `nnz` lines of "row col [value]" triples from `buf` (the region
// after the size line).  Indices are returned 0-based.  Returns 0 on
// success, a negative error code otherwise.  Parallelized by splitting the
// buffer into per-thread chunks aligned to line boundaries; each thread
// first counts lines in its chunk so writes land at exact offsets.

static inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

static inline const char* parse_i64(const char* p, const char* end, int64_t* out) {
    p = skip_ws(p, end);
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); p++; }
    int64_t v = 0;
    const char* q = p;
    while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); p++; }
    if (p == q) return nullptr;
    *out = neg ? -v : v;
    return p;
}

int acg_parse_coord(const char* buf, int64_t len, int64_t nnz, int nval,
                    int64_t* rowidx, int64_t* colidx, double* vals) {
    const char* end = buf + len;
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    // chunk boundaries aligned to newlines
    std::vector<const char*> starts(nthreads + 1);
    starts[0] = buf;
    for (int t = 1; t < nthreads; t++) {
        const char* p = buf + (len * t) / nthreads;
        while (p < end && *p != '\n') p++;
        starts[t] = (p < end) ? p + 1 : end;
    }
    starts[nthreads] = end;

    // count data lines per chunk (skip blank/comment lines)
    std::vector<int64_t> counts(nthreads, 0);
#pragma omp parallel for schedule(static)
    for (int t = 0; t < nthreads; t++) {
        const char* p = starts[t];
        const char* e = starts[t + 1];
        int64_t c = 0;
        while (p < e) {
            const char* nl = (const char*)memchr(p, '\n', e - p);
            const char* q = skip_ws(p, e);
            if (q < e && *q != '\n' && *q != '%') c++;
            p = nl ? nl + 1 : e;
        }
        counts[t] = c;
    }
    std::vector<int64_t> offs(nthreads + 1, 0);
    for (int t = 0; t < nthreads; t++) offs[t + 1] = offs[t] + counts[t];
    if (offs[nthreads] < nnz) return -1;  // not enough data lines

    int err = 0;
#pragma omp parallel for schedule(static)
    for (int t = 0; t < nthreads; t++) {
        const char* p = starts[t];
        const char* e = starts[t + 1];
        int64_t k = offs[t];
        while (p < e && k < nnz) {
            const char* nl = (const char*)memchr(p, '\n', e - p);
            const char* line_end = nl ? nl : e;
            const char* q = skip_ws(p, line_end);
            if (q < line_end && *q != '%') {
                int64_t r, c;
                const char* s = parse_i64(q, line_end, &r);
                if (!s) { err = -2; break; }
                s = parse_i64(s, line_end, &c);
                if (!s) { err = -2; break; }
                rowidx[k] = r - 1;
                colidx[k] = c - 1;
                if (nval) {
                    s = skip_ws(s, line_end);
                    char* ve = nullptr;
                    vals[k] = strtod(s, &ve);
                    if (ve == s) { err = -2; break; }
                }
                k++;
            }
            p = nl ? nl + 1 : e;
        }
    }
    return err;
}

// ---------------------------------------------------------------------------
// LSD radix sort of int64 keys producing the stable sorting permutation
// (acg/sort.c analogue: acgradixsort_int64 with permutation output).
// 8 passes of 8 bits over (key, index) pairs; signed order obtained by
// flipping the sign bit so the unsigned byte passes order int64 correctly.

int acg_radix_sort_i64(const int64_t* keys, int64_t n, int64_t* perm) {
    if (n < 0) return -1;
    std::vector<uint64_t> cur(n), nxt(n);
    std::vector<int64_t> pcur(n), pnxt(n);
    for (int64_t i = 0; i < n; i++) {
        cur[i] = (uint64_t)keys[i] ^ 0x8000000000000000ULL;
        pcur[i] = i;
    }
    int64_t count[256];
    for (int pass = 0; pass < 8; pass++) {
        int shift = pass * 8;
        // skip passes where every byte is equal (common for small ranges)
        uint64_t first = n ? ((cur[0] >> shift) & 0xFF) : 0;
        bool all_same = true;
        std::memset(count, 0, sizeof(count));
        for (int64_t i = 0; i < n; i++) {
            uint64_t b = (cur[i] >> shift) & 0xFF;
            count[b]++;
            all_same &= (b == first);
        }
        if (all_same) continue;
        int64_t offs[256], acc = 0;
        for (int b = 0; b < 256; b++) { offs[b] = acc; acc += count[b]; }
        for (int64_t i = 0; i < n; i++) {
            uint64_t b = (cur[i] >> shift) & 0xFF;
            int64_t dst = offs[b]++;
            nxt[dst] = cur[i];
            pnxt[dst] = pcur[i];
        }
        cur.swap(nxt);
        pcur.swap(pnxt);
    }
    std::memcpy(perm, pcur.data(), n * sizeof(int64_t));
    return 0;
}

// ---------------------------------------------------------------------------
// Graph partitioner: recursive bisection by BFS graph growing from a
// pseudo-peripheral vertex, with one pass of greedy boundary (KL/FM-style)
// refinement per bisection.  Same objective as the reference's METIS use
// (edge-cut minimization with balance, metis.c:118-190).

struct Graph {
    const int64_t* rowptr;
    const int32_t* colidx;
    int64_t n;
};

static int64_t bfs_order(const Graph& g, int64_t start,
                         const std::vector<uint8_t>& in_set,
                         std::vector<int64_t>& order,
                         std::vector<int32_t>& level) {
    std::fill(level.begin(), level.end(), -1);
    order.clear();
    std::queue<int64_t> q;
    q.push(start);
    level[start] = 0;
    while (!q.empty()) {
        int64_t u = q.front(); q.pop();
        order.push_back(u);
        for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++) {
            int64_t v = g.colidx[e];
            if (in_set[v] && level[v] < 0) {
                level[v] = level[u] + 1;
                q.push(v);
            }
        }
    }
    return order.empty() ? start : order.back();
}

static void refine_boundary(const Graph& g, std::vector<uint8_t>& side,
                            const std::vector<uint8_t>& in_set,
                            int64_t target0, int passes) {
    // greedy: move vertices whose gain (external - internal edges) > 0,
    // respecting balance within ±2% of target.
    int64_t n0 = 0, total = 0;
    for (int64_t u = 0; u < g.n; u++) if (in_set[u]) { total++; if (side[u] == 0) n0++; }
    int64_t slack = std::max<int64_t>(total / 50, 2);
    for (int pass = 0; pass < passes; pass++) {
        int64_t moved = 0;
        for (int64_t u = 0; u < g.n; u++) {
            if (!in_set[u]) continue;
            int ext = 0, inte = 0;
            for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++) {
                int64_t v = g.colidx[e];
                if (!in_set[v] || v == u) continue;
                if (side[v] != side[u]) ext++; else inte++;
            }
            if (ext > inte) {
                int64_t n0_new = n0 + (side[u] == 0 ? -1 : 1);
                if (std::llabs(n0_new - target0) <= slack) {
                    side[u] ^= 1;
                    n0 = n0_new;
                    moved++;
                }
            }
        }
        if (!moved) break;
    }
}

static void bisect(const Graph& g, std::vector<int64_t>& nodes, int k,
                   int64_t first_label, int64_t* part, uint64_t seed) {
    if (k == 1) {
        for (int64_t u : nodes) part[u] = first_label;
        return;
    }
    int k_left = k / 2;
    int64_t target_left = (int64_t)llround((double)nodes.size() * k_left / k);

    std::vector<uint8_t> in_set(g.n, 0);
    for (int64_t u : nodes) in_set[u] = 1;
    std::vector<uint8_t> taken(g.n, 0);
    std::vector<int64_t> order;
    std::vector<int32_t> level(g.n);
    std::mt19937_64 rng(seed);

    int64_t count = 0;
    std::vector<uint8_t> avail = in_set;
    std::vector<int64_t> remaining = nodes;
    while (count < target_left && !remaining.empty()) {
        // pseudo-peripheral start: BFS twice from a random vertex
        int64_t s = remaining[rng() % remaining.size()];
        int64_t far = bfs_order(g, s, avail, order, level);
        far = bfs_order(g, far, avail, order, level);
        (void)far;
        int64_t take = std::min<int64_t>(target_left - count, (int64_t)order.size());
        for (int64_t i = 0; i < take; i++) { taken[order[i]] = 1; avail[order[i]] = 0; }
        for (size_t i = take; i < order.size(); i++) avail[order[i]] = 0;
        count += take;
        // rebuild remaining = in_set && !taken && not in this BFS component
        std::vector<int64_t> rem2;
        rem2.reserve(remaining.size());
        for (int64_t u : remaining) if (avail[u]) rem2.push_back(u);
        // re-enable unconsumed component part for future BFS
        for (size_t i = take; i < order.size(); i++) { avail[order[i]] = 1; }
        rem2.clear();
        for (int64_t u : remaining) if (!taken[u] && avail[u]) rem2.push_back(u);
        remaining.swap(rem2);
    }

    // side: 0 = left(taken), 1 = right
    std::vector<uint8_t> side(g.n, 1);
    for (int64_t u : nodes) side[u] = taken[u] ? 0 : 1;
    refine_boundary(g, side, in_set, target_left, 4);

    std::vector<int64_t> left, right;
    left.reserve(target_left);
    for (int64_t u : nodes) (side[u] == 0 ? left : right).push_back(u);
    bisect(g, left, k_left, first_label, part, seed * 0x9E3779B97F4A7C15ULL + 1);
    bisect(g, right, k - k_left, first_label + k_left, part, seed * 0xC2B2AE3D27D4EB4FULL + 2);
}

int acg_partition_graph(const int64_t* rowptr, const int32_t* colidx,
                        int64_t n, int nparts, uint64_t seed, int64_t* part) {
    if (nparts < 1 || n < 0) return -1;
    Graph g{rowptr, colidx, n};
    std::vector<int64_t> nodes(n);
    for (int64_t i = 0; i < n; i++) nodes[i] = i;
    bisect(g, nodes, nparts, 0, part, seed ? seed : 1);
    return 0;
}

// ---------------------------------------------------------------------------
// Multilevel k-way partitioner — the METIS capability (metis.c:118-190):
// heavy-edge-matching coarsening, weighted recursive bisection at the
// coarsest level, then uncoarsening with greedy k-way boundary refinement
// (FM-style gains, vertex-weight balance) at every level.

struct MLGraph {
    std::vector<int64_t> rowptr;
    std::vector<int32_t> colidx;
    std::vector<int32_t> ewgt;   // contracted multi-edge weights
    std::vector<int32_t> vwgt;   // contracted vertex sizes
    int64_t n = 0;
};

// Heavy-edge matching via deterministic handshake rounds.
//
// The classic METIS visit-in-random-order greedy matching is inherently
// serial AND cache-hostile at scale: the shuffled visit order turns every
// rowptr/colidx/match access into a random miss (measured as the
// dominant cost of the 53 s partition at 449M edges).  Handshaking fixes
// both: each round, every unmatched vertex PROPOSES to its heaviest
// unmatched neighbour (ties broken by a hashed id so regular unit-weight
// graphs don't collapse into one-directional chains), and mutual
// proposals match.  Proposals read only the previous round's match
// state, and each mutual pair's writes are disjoint, so the rounds are
// embarrassingly parallel AND the result is identical for any thread
// count (deterministic given the seed — required here because the build
// host has one core: the parallel path cannot be race-tested locally,
// so it must be equivalent by construction).  Vertices are visited in
// sequential order: on banded/mesh graphs every access streams.
// A final serial cleanup pass greedily matches the leftovers (~10-20%).
// cmap maps fine -> coarse ids (in first-occurrence order).

static inline uint64_t mix64(uint64_t x) {
    x ^= x >> 33; x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 33; x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 33; return x;
}

static int64_t hem_match(const int64_t* rowptr, const int32_t* colidx,
                         const int32_t* ewgt, int64_t n,
                         uint64_t seed, std::vector<int64_t>& cmap) {
    std::vector<int32_t> match(n, -1), prop(n, -1);
    const int ROUNDS = 4;
    for (int round = 0; round < ROUNDS; round++) {
        int64_t matched = 0;
#pragma omp parallel for schedule(static)
        for (int64_t u = 0; u < n; u++) {
            if (match[u] >= 0) { prop[u] = -1; continue; }
            int32_t best = -1;
            int64_t bestw = -1;
            uint64_t besth = ~0ULL;
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                int32_t v = colidx[e];
                if ((int64_t)v == u || match[v] >= 0) continue;
                int64_t w = ewgt ? ewgt[e] : 1;
                if (w < bestw) continue;
                uint64_t h = mix64((uint64_t)v + seed);
                if (w > bestw || h < besth) {
                    bestw = w; besth = h; best = v;
                }
            }
            prop[u] = best;
        }
#pragma omp parallel for schedule(static) reduction(+:matched)
        for (int64_t u = 0; u < n; u++) {
            int32_t v = prop[u];
            if (v >= 0 && (int64_t)v > u && prop[v] == (int32_t)u) {
                match[u] = v;
                match[v] = (int32_t)u;
                matched += 2;
            }
        }
        if (!matched) break;
    }
    // serial cleanup: sequential-order greedy over the leftovers
    for (int64_t u = 0; u < n; u++) {
        if (match[u] >= 0) continue;
        int32_t best = -1;
        int64_t bestw = -1;
        for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
            int32_t v = colidx[e];
            if ((int64_t)v == u || match[v] >= 0) continue;
            if (!ewgt) { best = v; break; }   // unit weights: first
                                              // unmatched IS maximal
            if (ewgt[e] > bestw) { bestw = ewgt[e]; best = v; }
        }
        if (best >= 0) { match[u] = best; match[best] = (int32_t)u; }
        else match[u] = (int32_t)u;
    }
    cmap.assign(n, -1);
    int64_t nc = 0;
    for (int64_t u = 0; u < n; u++) {
        if (cmap[u] >= 0) continue;
        cmap[u] = nc;
        if (match[u] != (int32_t)u) cmap[match[u]] = nc;
        nc++;
    }
    return nc;
}

// Contract the graph through cmap: coarse adjacency deduped per coarse row
// with a stamp array (no sorting — O(nnz) per level, the metis approach).
static MLGraph contract(const int64_t* rowptr, const int32_t* colidx,
                        const int32_t* ewgt, const int32_t* vwgt,
                        int64_t n, const std::vector<int64_t>& cmap,
                        int64_t nc) {
    MLGraph cg;
    cg.n = nc;
    cg.vwgt.assign(nc, 0);
    // children of each coarse vertex via counting sort
    std::vector<int64_t> cstart(nc + 1, 0), child(n);
    for (int64_t u = 0; u < n; u++) cstart[cmap[u] + 1]++;
    for (int64_t c = 0; c < nc; c++) cstart[c + 1] += cstart[c];
    {
        std::vector<int64_t> fill(cstart.begin(), cstart.end() - 1);
        for (int64_t u = 0; u < n; u++) child[fill[cmap[u]]++] = u;
    }
    for (int64_t u = 0; u < n; u++)
        cg.vwgt[cmap[u]] += vwgt ? vwgt[u] : 1;

    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    cg.rowptr.assign(nc + 1, 0);
    if (nthreads == 1) {
        // single pass: emit deduped coarse adjacency into arrays
        // over-allocated to the fine nnz, then shrink.  (Count-then-fill
        // scans the fine edges twice; serially the single pass wins at
        // the 449M-edge finest level.)
        std::vector<int64_t> mark(nc, -1);
        std::vector<int64_t> pos(nc, 0);
        cg.colidx.resize(rowptr[n]);
        cg.ewgt.resize(rowptr[n]);
        int64_t out = 0;
        for (int64_t cu = 0; cu < nc; cu++) {
            for (int64_t ci = cstart[cu]; ci < cstart[cu + 1]; ci++) {
                int64_t u = child[ci];
                for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                    int64_t cv = cmap[colidx[e]];
                    if (cv == cu) continue;
                    int32_t w = ewgt ? ewgt[e] : 1;
                    if (mark[cv] != cu) {
                        mark[cv] = cu;
                        pos[cv] = out;
                        cg.colidx[out] = (int32_t)cv;
                        cg.ewgt[out] = w;
                        out++;
                    } else {
                        cg.ewgt[pos[cv]] += w;
                    }
                }
            }
            cg.rowptr[cu + 1] = out;
        }
        cg.colidx.resize(out);
        cg.colidx.shrink_to_fit();
        cg.ewgt.resize(out);
        cg.ewgt.shrink_to_fit();
        return cg;
    }
    // parallel count-then-fill over coarse rows with thread-private
    // stamp arrays.  The per-row first-occurrence dedupe order is the
    // same as the single-pass variant, so the output is bit-identical
    // for any thread count (the schedule only changes WHO computes a
    // row, never its contents or offset).
#pragma omp parallel
    {
        std::vector<int32_t> mark(nc, -1);
#pragma omp for schedule(dynamic, 256)
        for (int64_t cu = 0; cu < nc; cu++) {
            int64_t cnt = 0;
            for (int64_t ci = cstart[cu]; ci < cstart[cu + 1]; ci++) {
                int64_t u = child[ci];
                for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                    int64_t cv = cmap[colidx[e]];
                    if (cv == cu || mark[cv] == (int32_t)cu) continue;
                    mark[cv] = (int32_t)cu;
                    cnt++;
                }
            }
            cg.rowptr[cu + 1] = cnt;
        }
    }
    for (int64_t cu = 0; cu < nc; cu++) cg.rowptr[cu + 1] += cg.rowptr[cu];
    cg.colidx.resize(cg.rowptr[nc]);
    cg.ewgt.resize(cg.rowptr[nc]);
#pragma omp parallel
    {
        std::vector<int32_t> mark(nc, -1);
        std::vector<int64_t> pos(nc, 0);
#pragma omp for schedule(dynamic, 256)
        for (int64_t cu = 0; cu < nc; cu++) {
            int64_t out = cg.rowptr[cu];
            for (int64_t ci = cstart[cu]; ci < cstart[cu + 1]; ci++) {
                int64_t u = child[ci];
                for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                    int64_t cv = cmap[colidx[e]];
                    if (cv == cu) continue;
                    int32_t w = ewgt ? ewgt[e] : 1;
                    if (mark[cv] != (int32_t)cu) {
                        mark[cv] = (int32_t)cu;
                        pos[cv] = out;
                        cg.colidx[out] = (int32_t)cv;
                        cg.ewgt[out] = w;
                        out++;
                    } else {
                        cg.ewgt[pos[cv]] += w;
                    }
                }
            }
        }
    }
    return cg;
}

// Greedy k-way boundary refinement: move a vertex to the neighbouring part
// with maximal connectivity gain if the balance constraint allows
// (FM-style gains without the priority queue; a few passes suffice since
// multilevel projection leaves only boundary-local errors).
static void kway_refine(const int64_t* rowptr, const int32_t* colidx,
                        const int32_t* ewgt, const int32_t* vwgt,
                        int64_t n, int nparts, int64_t* part,
                        int passes, double tol) {
    std::vector<int64_t> pw(nparts, 0);
    int64_t total = 0;
    for (int64_t u = 0; u < n; u++) {
        int64_t w = vwgt ? vwgt[u] : 1;
        pw[part[u]] += w;
        total += w;
    }
    int64_t maxw = (int64_t)((double)total / nparts * (1.0 + tol)) + 1;
    std::vector<int64_t> conn(nparts, 0);
    std::vector<int> seen;
    seen.reserve(64);
    for (int pass = 0; pass < passes; pass++) {
        int64_t moved = 0;
        for (int64_t u = 0; u < n; u++) {
            int64_t p = part[u];
            bool boundary = false;
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                if (part[colidx[e]] != p) { boundary = true; break; }
            }
            if (!boundary) continue;
            // accumulate connectivity (only now, for boundary vertices)
            seen.clear();
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                int64_t v = colidx[e];
                if (v == u) continue;
                int64_t q = part[v];
                if (conn[q] == 0) seen.push_back((int)q);
                conn[q] += ewgt ? ewgt[e] : 1;
            }
            int64_t best = -1, bestc = -1;
            for (int q : seen) {
                if (q == p) continue;
                if (conn[q] > bestc ||
                    (conn[q] == bestc && pw[q] < pw[best])) {
                    bestc = conn[q];
                    best = q;
                }
            }
            int64_t cp = conn[p];
            for (int q : seen) conn[q] = 0;
            if (best < 0) continue;
            int64_t w = vwgt ? vwgt[u] : 1;
            int64_t gain = bestc - cp;
            bool balance_ok = pw[best] + w <= maxw && pw[p] - w > 0;
            bool better_balance = pw[p] > pw[best] + w;
            if ((gain > 0 || (gain == 0 && better_balance)) && balance_ok) {
                part[u] = best;
                pw[p] -= w;
                pw[best] += w;
                moved++;
            }
        }
        if (!moved) break;
    }
}

// Weighted bisection of the (small) coarsest graph: BFS growing from a
// pseudo-peripheral vertex until half the total vertex weight, plus
// weighted greedy refinement via kway_refine with nparts=2 labels.
static void wbisect(const MLGraph& g, std::vector<int64_t>& nodes, int k,
                    int64_t first_label, int64_t* part, std::mt19937_64& rng) {
    if (k == 1) {
        for (int64_t u : nodes) part[u] = first_label;
        return;
    }
    int k_left = k / 2;
    int64_t total = 0;
    for (int64_t u : nodes) total += g.vwgt[u];
    int64_t target_left = (int64_t)llround((double)total * k_left / k);

    std::vector<uint8_t> in_set(g.n, 0);
    for (int64_t u : nodes) in_set[u] = 1;
    std::vector<uint8_t> taken(g.n, 0);
    std::vector<uint8_t> avail = in_set;
    std::vector<int64_t> remaining = nodes;
    int64_t grown = 0;
    std::vector<int64_t> order;
    std::vector<int32_t> level(g.n);
    while (grown < target_left && !remaining.empty()) {
        int64_t s = remaining[rng() % remaining.size()];
        // pseudo-peripheral: two BFS sweeps
        order.clear();
        std::fill(level.begin(), level.end(), -1);
        {
            std::queue<int64_t> q;
            q.push(s);
            level[s] = 0;
            while (!q.empty()) {
                int64_t u = q.front(); q.pop();
                order.push_back(u);
                for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++) {
                    int64_t v = g.colidx[e];
                    if (avail[v] && level[v] < 0) { level[v] = level[u] + 1; q.push(v); }
                }
            }
        }
        int64_t far = order.empty() ? s : order.back();
        order.clear();
        std::fill(level.begin(), level.end(), -1);
        {
            std::queue<int64_t> q;
            q.push(far);
            level[far] = 0;
            while (!q.empty()) {
                int64_t u = q.front(); q.pop();
                order.push_back(u);
                for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++) {
                    int64_t v = g.colidx[e];
                    if (avail[v] && level[v] < 0) { level[v] = level[u] + 1; q.push(v); }
                }
            }
        }
        size_t take = 0;
        for (; take < order.size() && grown < target_left; take++) {
            taken[order[take]] = 1;
            grown += g.vwgt[order[take]];
        }
        for (size_t i = 0; i < order.size(); i++) avail[order[i]] = 0;
        std::vector<int64_t> rem2;
        rem2.reserve(remaining.size());
        for (int64_t u : remaining)
            if (!taken[u] && level[u] < 0) rem2.push_back(u);
        // unconsumed part of this component stays available for regrowth
        for (size_t i = take; i < order.size(); i++) avail[order[i]] = 1;
        for (int64_t u : remaining)
            if (!taken[u] && avail[u] && level[u] >= 0) rem2.push_back(u);
        remaining.swap(rem2);
    }

    // refine the 2-way split on the subgraph: label 0 = taken, 1 = rest
    std::vector<int64_t> side(g.n, 0);
    for (int64_t u : nodes) side[u] = taken[u] ? 0 : 1;
    // temporary 2-part refinement restricted to the subgraph: build the
    // subgraph explicitly (coarsest level is small, this is cheap)
    {
        std::vector<int64_t> lid(g.n, -1);
        for (size_t i = 0; i < nodes.size(); i++) lid[nodes[i]] = (int64_t)i;
        MLGraph sg;
        sg.n = (int64_t)nodes.size();
        sg.rowptr.assign(sg.n + 1, 0);
        for (size_t i = 0; i < nodes.size(); i++) {
            int64_t u = nodes[i];
            int64_t cnt = 0;
            for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++)
                if (lid[g.colidx[e]] >= 0) cnt++;
            sg.rowptr[i + 1] = sg.rowptr[i] + cnt;
        }
        sg.colidx.assign(sg.rowptr[sg.n], 0);
        sg.ewgt.assign(sg.rowptr[sg.n], 0);
        sg.vwgt.assign(sg.n, 0);
        std::vector<int64_t> spart(sg.n);
        for (size_t i = 0; i < nodes.size(); i++) {
            int64_t u = nodes[i];
            sg.vwgt[i] = g.vwgt[u];
            spart[i] = side[u];
            int64_t out = sg.rowptr[i];
            for (int64_t e = g.rowptr[u]; e < g.rowptr[u + 1]; e++) {
                int64_t lv = lid[g.colidx[e]];
                if (lv < 0) continue;
                sg.colidx[out] = (int32_t)lv;
                sg.ewgt[out] = g.ewgt.empty() ? 1 : g.ewgt[e];
                out++;
            }
        }
        kway_refine(sg.rowptr.data(), sg.colidx.data(), sg.ewgt.data(),
                    sg.vwgt.data(), sg.n, 2, spart.data(), 6, 0.02);
        for (size_t i = 0; i < nodes.size(); i++) side[nodes[i]] = spart[i];
    }

    std::vector<int64_t> left, right;
    for (int64_t u : nodes) (side[u] == 0 ? left : right).push_back(u);
    if (left.empty() || right.empty()) {
        // degenerate: fall back to a weight-balanced arbitrary split
        left.clear(); right.clear();
        int64_t acc = 0;
        for (int64_t u : nodes) {
            if (acc < target_left) { left.push_back(u); acc += g.vwgt[u]; }
            else right.push_back(u);
        }
    }
    wbisect(g, left, k_left, first_label, part, rng);
    wbisect(g, right, k - k_left, first_label + k_left, part, rng);
}

int acg_partition_graph_ml(const int64_t* rowptr, const int32_t* colidx,
                           int64_t n, int nparts, uint64_t seed,
                           int64_t* part) {
    if (nparts < 1 || n < 0) return -1;
    if (nparts == 1 || n == 0) {
        for (int64_t i = 0; i < n; i++) part[i] = 0;
        return 0;
    }
    std::mt19937_64 rng(seed ? seed : 1);
    const bool verbose = std::getenv("ACG_PART_VERBOSE") != nullptr;

    // --- coarsen ----------------------------------------------------------
    std::vector<MLGraph> levels;          // levels[0] = first COARSE graph
    std::vector<std::vector<int64_t>> cmaps;
    int64_t coarse_stop = std::max<int64_t>(20 * (int64_t)nparts, 256);
    {
        const int64_t* rp = rowptr;
        const int32_t* ci = colidx;
        const int32_t* ew = nullptr;
        const int32_t* vw = nullptr;
        int64_t cn = n;
        while (cn > coarse_stop && (int)levels.size() < 48) {
            std::vector<int64_t> cmap;
            auto tm0 = std::chrono::steady_clock::now();
            int64_t nc = hem_match(rp, ci, ew, cn, rng(), cmap);
            auto tm1 = std::chrono::steady_clock::now();
            if (nc > (int64_t)(0.95 * (double)cn)) break;   // stalled
            levels.push_back(contract(rp, ci, ew, vw, cn, cmap, nc));
            auto tm2 = std::chrono::steady_clock::now();
            if (verbose)
                fprintf(stderr,
                        "  level %2zu: n %11lld -> %11lld  match %.2fs "
                        "contract %.2fs\n", levels.size(),
                        (long long)cn, (long long)nc,
                        std::chrono::duration<double>(tm1 - tm0).count(),
                        std::chrono::duration<double>(tm2 - tm1).count());
            cmaps.push_back(std::move(cmap));
            MLGraph& g = levels.back();
            rp = g.rowptr.data();
            ci = g.colidx.data();
            ew = g.ewgt.data();
            vw = g.vwgt.data();
            cn = g.n;
        }
    }

    // --- initial partition at the coarsest level ---------------------------
    std::vector<int64_t> cpart;
    if (levels.empty()) {
        cpart.assign(n, 0);
        MLGraph g0;   // wrap the input as an MLGraph view (copies; n small)
        g0.n = n;
        g0.rowptr.assign(rowptr, rowptr + n + 1);
        g0.colidx.assign(colidx, colidx + rowptr[n]);
        g0.ewgt.assign(rowptr[n], 1);
        g0.vwgt.assign(n, 1);
        std::vector<int64_t> nodes(n);
        for (int64_t i = 0; i < n; i++) nodes[i] = i;
        wbisect(g0, nodes, nparts, 0, cpart.data(), rng);
        kway_refine(rowptr, colidx, nullptr, nullptr, n, nparts,
                    cpart.data(), 8, 0.03);
        std::memcpy(part, cpart.data(), n * sizeof(int64_t));
        return 0;
    }
    {
        MLGraph& g = levels.back();
        cpart.assign(g.n, 0);
        std::vector<int64_t> nodes(g.n);
        for (int64_t i = 0; i < g.n; i++) nodes[i] = i;
        wbisect(g, nodes, nparts, 0, cpart.data(), rng);
        kway_refine(g.rowptr.data(), g.colidx.data(), g.ewgt.data(),
                    g.vwgt.data(), g.n, nparts, cpart.data(), 8, 0.03);
    }

    // --- uncoarsen + refine -------------------------------------------------
    for (int64_t lev = (int64_t)levels.size() - 1; lev >= 0; lev--) {
        const std::vector<int64_t>& cmap = cmaps[lev];
        int64_t fine_n = (lev == 0) ? n : levels[lev - 1].n;
        std::vector<int64_t> fpart(fine_n);
        for (int64_t u = 0; u < fine_n; u++) fpart[u] = cpart[cmap[u]];
        auto tr0 = std::chrono::steady_clock::now();
        if (lev == 0) {
            kway_refine(rowptr, colidx, nullptr, nullptr, n, nparts,
                        fpart.data(), 2, 0.03);
            if (verbose)
                fprintf(stderr, "  finest refine: %.2fs\n",
                        std::chrono::duration<double>(
                            std::chrono::steady_clock::now() - tr0).count());
        } else {
            MLGraph& g = levels[lev - 1];
            kway_refine(g.rowptr.data(), g.colidx.data(), g.ewgt.data(),
                        g.vwgt.data(), g.n, nparts, fpart.data(), 3, 0.03);
        }
        cpart.swap(fpart);
    }
    std::memcpy(part, cpart.data(), n * sizeof(int64_t));
    return 0;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering: bandwidth reduction so general matrices
// become banded (DIA-able) — the TPU substitute for gather-based SpMV.

int acg_rcm_order(const int64_t* rowptr, const int32_t* colidx, int64_t n,
                  int64_t* perm) {
    std::vector<uint8_t> visited(n, 0);
    std::vector<int64_t> degree(n);
    for (int64_t i = 0; i < n; i++) degree[i] = rowptr[i + 1] - rowptr[i];
    int64_t idx = 0;
    std::vector<int64_t> nbrs;
    for (int64_t comp_start = 0; comp_start < n; comp_start++) {
        if (visited[comp_start]) continue;
        // min-degree start vertex in this component via BFS discovery
        int64_t start = comp_start;
        std::queue<int64_t> q;
        q.push(start);
        visited[start] = 1;
        int64_t head = idx;
        perm[idx++] = start;
        while (!q.empty()) {
            int64_t u = q.front(); q.pop();
            nbrs.clear();
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                int64_t v = colidx[e];
                if (!visited[v]) { visited[v] = 1; nbrs.push_back(v); }
            }
            std::sort(nbrs.begin(), nbrs.end(),
                      [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
            for (int64_t v : nbrs) { perm[idx++] = v; q.push(v); }
        }
        (void)head;
    }
    std::reverse(perm, perm + n);  // reverse CM
    return 0;
}

// Greedy BFS-ball clustering order: emit the graph as consecutive balls
// of ~`ball` vertices so every `ball`-row window of the permuted matrix
// is a COMPACT neighbourhood (2-D locality), not a thin BFS level slice
// (RCM's 1-D bandwidth objective).  Raises the SELL layout's
// rows-per-(tile, chunk) density — the chunked-gather format's fill
// lever (core/sell.py).  O(nnz): each edge is scanned O(1) times.
int acg_cluster_order(const int64_t* rowptr, const int32_t* colidx,
                      int64_t n, int64_t ball, int64_t* perm) {
    std::vector<uint8_t> visited(n, 0);
    int64_t idx = 0;
    int64_t scan = 0;                 // next-unvisited pointer
    std::vector<int64_t> ballq;
    ballq.reserve((size_t)ball);
    int64_t frontier = 0;             // perm[frontier..idx) = seed candidates
    while (idx < n) {
        // seed: an unvisited neighbour of the emitted region, else the
        // next unvisited vertex (new component / exhausted frontier)
        int64_t seed = -1;
        while (frontier < idx && seed < 0) {
            const int64_t u = perm[frontier];
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                const int32_t v = colidx[e];
                if (!visited[v]) { seed = v; break; }
            }
            if (seed < 0) frontier++;
        }
        if (seed < 0) {
            while (scan < n && visited[scan]) scan++;
            seed = scan;
        }
        // grow a ball by local BFS
        ballq.clear();
        visited[seed] = 1;
        ballq.push_back(seed);
        for (size_t head = 0; head < ballq.size()
                 && (int64_t)ballq.size() < ball; head++) {
            const int64_t u = ballq[head];
            for (int64_t e = rowptr[u]; e < rowptr[u + 1]; e++) {
                const int32_t v = colidx[e];
                if (!visited[v]) {
                    visited[v] = 1;
                    ballq.push_back(v);
                    if ((int64_t)ballq.size() == ball) break;
                }
            }
        }
        for (int64_t v : ballq) perm[idx++] = v;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Partitioned-operator ELL split: the hot passes of the setup path
// (symcsrmatrix.c:685-845 fa/oa split + graph.c:813-1529 subgraph
// assembly, re-expressed as two streaming passes over the CSR entries;
// the plan/ordering bookkeeping stays in numpy where it is cheap).

// Pass 1: per-row owned/ghost entry counts, plus the (part*n + col) key
// of every off-part entry in entry order.  pc_keys must have capacity
// nnz; the used length is returned through total_gst_out.
int acg_ell_scan(const int64_t* rowptr, const int32_t* colidx,
                 const int32_t* part, int64_t n,
                 int32_t* cnt_own, int32_t* cnt_gst,
                 int64_t* pc_keys, int64_t* total_gst_out) {
    int64_t tg = 0;
    for (int64_t r = 0; r < n; r++) {
        const int32_t p = part[r];
        int32_t co = 0, cg = 0;
        for (int64_t e = rowptr[r]; e < rowptr[r + 1]; e++) {
            const int32_t c = colidx[e];
            if (part[c] == p) {
                co++;
            } else {
                pc_keys[tg++] = (int64_t)p * n + c;
                cg++;
            }
        }
        cnt_own[r] = co;
        cnt_gst[r] = cg;
    }
    *total_gst_out = tg;
    return 0;
}

// Pass 2: scatter every entry into the stacked (P, K, L) ELL slabs.
// Owned entries renumber through g2l; ghost entries find their ghost
// slot by binary search in the per-part (global-sorted) lookup
// sorted_g/slot_of (built from ghost_global, which is (owner, global)-
// sorted and therefore not directly searchable).
//
// Writes go straight into the (P, K, L) slabs: a row's K entries land
// at stride L (up to 2K store streams).  A staged row-major buffer +
// blocked transpose was tried to make the stores sequential and
// measured SLOWER on this host (132.7 s vs 84.6 s at 450M nnz — the
// extra 11 GB of staging traffic costs more than the strided stores
// save).  own_colidx must be prefilled with the identity pattern by the
// caller; vals/ghost slabs zero-initialized.
int acg_ell_fill(const int64_t* rowptr, const int32_t* colidx,
                 const double* data, const int32_t* part,
                 const int32_t* g2l, int64_t n,
                 int64_t K_own, int64_t K_gst, int64_t L,
                 const int64_t* sorted_g, const int64_t* slot_of,
                 const int64_t* n_ghost, int64_t G, int64_t P,
                 int32_t* own_colidx, double* own_vals,
                 int32_t* ghost_colidx, double* ghost_vals) {
    (void)P;
    for (int64_t r = 0; r < n; r++) {
        const int32_t p = part[r];
        const int64_t li = g2l[r];
        const int64_t own_base = ((int64_t)p * K_own) * L + li;
        const int64_t gst_base = ((int64_t)p * K_gst) * L + li;
        const int64_t* sg = sorted_g + (int64_t)p * G;
        const int64_t* so = slot_of + (int64_t)p * G;
        const int64_t ng = n_ghost[p];
        const int64_t pad = G - ng;   // -1 pads sort to the front
        int64_t ko = 0, kg = 0;
        for (int64_t e = rowptr[r]; e < rowptr[r + 1]; e++) {
            const int32_t c = colidx[e];
            if (part[c] == p) {
                own_colidx[own_base + ko * L] = g2l[c];
                own_vals[own_base + ko * L] = data[e];
                ko++;
            } else {
                int64_t lo = pad, hi = pad + ng;
                while (lo < hi) {
                    const int64_t mid = (lo + hi) >> 1;
                    if (sg[mid] < c) lo = mid + 1; else hi = mid;
                }
                if (lo >= pad + ng || sg[lo] != c) return 1;
                ghost_colidx[gst_base + kg * L] = (int32_t)so[lo];
                ghost_vals[gst_base + kg * L] = data[e];
                kg++;
            }
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// SELL per-tile layout build (core/sell.py's hot passes): one streaming
// scan emits the (tile, chunk) -> K table; the fill pass scatters every
// entry into the (ntiles, G, 8, 128) slabs.  The numpy version of this
// (argsort/unique over nnz-length arrays) measured 418 s at 46M nnz.

// Pass 1: distinct (tile, chunk) pairs in row-scan order with the max
// per-row run length K.  Tables must have capacity nnz.  ncols sizes the
// chunk map — blocks may be rectangular (a partition's interface block
// is L rows x G ghost columns), so the column count is NOT n.
int acg_sell_scan(const int64_t* rowptr, const int32_t* colidx, int64_t n,
                  int64_t ncols,
                  int64_t* tc_tile, int32_t* tc_chunk, int32_t* tc_k,
                  int64_t* n_tc_out) {
    int64_t n_tc = 0;
    const int64_t ntiles = (n + 127) >> 7;
    // per-tile chunk map: chunk -> table index, reset per tile via stamps
    std::vector<int64_t> stamp;     // chunk -> last tile that touched it
    std::vector<int64_t> slot;      // chunk -> table index for that tile
    const int64_t nchunks = (ncols + 127) >> 7;
    stamp.assign(nchunks, -1);
    slot.assign(nchunks, 0);
    for (int64_t t = 0; t < ntiles; t++) {
        const int64_t r1 = std::min((t + 1) << 7, n);
        for (int64_t r = t << 7; r < r1; r++) {
            int64_t e = rowptr[r];
            const int64_t e1 = rowptr[r + 1];
            while (e < e1) {
                const int32_t c = colidx[e] >> 7;
                int64_t run = 1;
                while (e + run < e1 && (colidx[e + run] >> 7) == c) run++;
                if (stamp[c] != t) {
                    stamp[c] = t;
                    slot[c] = n_tc;
                    tc_tile[n_tc] = t;
                    tc_chunk[n_tc] = c;
                    tc_k[n_tc] = (int32_t)run;
                    n_tc++;
                } else if ((int32_t)run > tc_k[slot[c]]) {
                    tc_k[slot[c]] = (int32_t)run;
                }
                e += run;
            }
        }
    }
    *n_tc_out = n_tc;
    return 0;
}

// Pass 2: per-entry slab ROW index fr = (tile·G + group)·8 + sub-slot
// (the slabs viewed as (ntiles·G·8, 128) rows; the lane within the row
// is rho = row & 127).  group_base maps each (tile, chunk) pair — in
// the SAME scan order as pass 1, so the same stamp walk reproduces the
// table indices — to its first group.  The actual slab materialization
// happens ON DEVICE (a jitted scatter): shipping the padded slabs
// through the device tunnel measured 233 s at 46M nnz / 12.3 GB padded,
// vs ~0.7 GB for the entry arrays.
// tile_base[t] = first slab row block of tile t (bucketed layouts place
// sorted tiles contiguously with per-bucket G strides; the flat slab
// row is tile_base[t] + g).
int acg_sell_entries(const int64_t* rowptr, const int32_t* colidx,
                     int64_t n, int64_t ncols, const int64_t* tile_base,
                     const int64_t* group_base,
                     int32_t* fr) {
    const int64_t ntiles = (n + 127) >> 7;
    const int64_t nchunks = (ncols + 127) >> 7;
    std::vector<int64_t> stamp(nchunks, -1), slot(nchunks, 0);
    int64_t tc = 0;
    for (int64_t t = 0; t < ntiles; t++) {
        const int64_t r1 = std::min((t + 1) << 7, n);
        // first sweep of the tile establishes this tile's chunk->base
        // mapping in scan order (matching pass 1's enumeration)
        for (int64_t r = t << 7; r < r1; r++) {
            int64_t e = rowptr[r];
            const int64_t e1 = rowptr[r + 1];
            while (e < e1) {
                const int64_t c = colidx[e] >> 7;
                int64_t run = 1;
                while (e + run < e1 && (colidx[e + run] >> 7) == c) run++;
                if (stamp[c] != t) {
                    stamp[c] = t;
                    slot[c] = group_base[tc++];
                }
                e += run;
            }
        }
        for (int64_t r = t << 7; r < r1; r++) {
            int64_t prev_c = -1, rank = 0;
            for (int64_t e = rowptr[r]; e < rowptr[r + 1]; e++) {
                const int64_t c = colidx[e] >> 7;
                rank = (c == prev_c) ? rank + 1 : 0;
                prev_c = c;
                const int64_t g = slot[c] + (rank >> 3);
                fr[e] = (int32_t)((tile_base[t] + g) * 8 + (rank & 7));
            }
        }
    }
    return 0;
}

}  // extern "C"
