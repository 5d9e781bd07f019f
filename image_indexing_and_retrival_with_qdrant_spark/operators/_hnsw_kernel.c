/* Deterministic HNSW build/search kernel — a C port of the Python
 * beam in operators/hnsw.py (hnsw_build_np / _search_layer /
 * _select_heuristic), bit-identical by construction:
 *
 * - distances are squared euclidean with numpy's exact summation:
 *   elementwise diff², then the SCALAR pairwise reduction numpy's
 *   add.reduce(axis=1) applies to contiguous float64 rows (0-seeded
 *   sequential below 8 elements; 8-accumulator unroll combined as
 *   ((r0+r1)+(r2+r3))+((r4+r5)+(r6+r7)) up to 128; recursive halving
 *   above — numpy/core/src/umath/loops_utils.h.src, public source).
 *   IEEE double ops in fixed order are exact, so per-pair bits equal
 *   numpy's (build with -ffp-contract=off: no FMA contraction).
 * - all candidate/result ordering is by (dist, pos) exactly as the
 *   Python tuples compare; the result heap overflows (dist, pos)-max
 *   first, matching the (-d, -p) min-heap.
 * - traversal marks/filters neighbors in stored list order, so the
 *   walk visits the same nodes in the same order.
 *
 * The Python wrapper (hnsw_native.py) verifies a fixture build
 * against the pure-Python path at load time and falls back to Python
 * whenever compilation or that parity probe fails, so this file is a
 * throughput device, never a semantics change.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int64_t i64;

typedef struct {
    double d;
    i64 p;
} DP;

/* ---- numpy scalar pairwise summation (exact port) ---------------- */

static double pairwise_sum(const double *a, i64 n)
{
    if (n < 8) {
        double res = 0.0;
        for (i64 i = 0; i < n; i++)
            res = res + a[i];
        return res;
    }
    if (n <= 128) {
        double r0 = a[0], r1 = a[1], r2 = a[2], r3 = a[3];
        double r4 = a[4], r5 = a[5], r6 = a[6], r7 = a[7];
        i64 i;
        for (i = 8; i < n - (n % 8); i += 8) {
            r0 += a[i + 0];
            r1 += a[i + 1];
            r2 += a[i + 2];
            r3 += a[i + 3];
            r4 += a[i + 4];
            r5 += a[i + 5];
            r6 += a[i + 6];
            r7 += a[i + 7];
        }
        double res = ((r0 + r1) + (r2 + r3)) + ((r4 + r5) + (r6 + r7));
        for (; i < n; i++)
            res = res + a[i];
        return res;
    }
    i64 n2 = n / 2;
    n2 -= n2 % 8;
    return pairwise_sum(a, n2) + pairwise_sum(a + n2, n - n2);
}

/* squared euclidean, numpy-bit-exact: diff, square, pairwise sum */
static double sqdist(const double *x, const double *y, i64 d, double *tmp)
{
    for (i64 i = 0; i < d; i++) {
        double t = x[i] - y[i];
        tmp[i] = t * t;
    }
    return pairwise_sum(tmp, d);
}

/* ---- (dist, pos) heaps ------------------------------------------- */

static inline int dp_lt(DP a, DP b)
{
    return a.d < b.d || (a.d == b.d && a.p < b.p);
}

/* min-heap keyed ascending by (d, p) — the candidate frontier */
static void minh_push(DP *h, i64 *len, DP v)
{
    i64 i = (*len)++;
    h[i] = v;
    while (i > 0) {
        i64 par = (i - 1) / 2;
        if (dp_lt(h[i], h[par])) {
            DP t = h[i]; h[i] = h[par]; h[par] = t;
            i = par;
        } else
            break;
    }
}

static void minh_siftdown(DP *h, i64 len, i64 i)
{
    for (;;) {
        i64 l = 2 * i + 1, r = l + 1, best = i;
        if (l < len && dp_lt(h[l], h[best])) best = l;
        if (r < len && dp_lt(h[r], h[best])) best = r;
        if (best == i) break;
        DP t = h[i]; h[i] = h[best]; h[best] = t;
        i = best;
    }
}

static DP minh_pop(DP *h, i64 *len)
{
    DP top = h[0];
    h[0] = h[--(*len)];
    minh_siftdown(h, *len, 0);
    return top;
}

/* max-heap keyed descending by (d, p) — the result set; its top is
 * the farthest member (ties resolved to the larger pos), exactly the
 * Python (-d, -p) min-heap's view. */
static inline int dp_gt(DP a, DP b)
{
    return a.d > b.d || (a.d == b.d && a.p > b.p);
}

static void maxh_push(DP *h, i64 *len, DP v)
{
    i64 i = (*len)++;
    h[i] = v;
    while (i > 0) {
        i64 par = (i - 1) / 2;
        if (dp_gt(h[i], h[par])) {
            DP t = h[i]; h[i] = h[par]; h[par] = t;
            i = par;
        } else
            break;
    }
}

static void maxh_siftdown(DP *h, i64 len, i64 i)
{
    for (;;) {
        i64 l = 2 * i + 1, r = l + 1, best = i;
        if (l < len && dp_gt(h[l], h[best])) best = l;
        if (r < len && dp_gt(h[r], h[best])) best = r;
        if (best == i) break;
        DP t = h[i]; h[i] = h[best]; h[best] = t;
        i = best;
    }
}

static void maxh_pop(DP *h, i64 *len)
{
    h[0] = h[--(*len)];
    maxh_siftdown(h, *len, 0);
}

/* replace the top (Python heapq.heapreplace) */
static void maxh_replace(DP *h, i64 len, DP v)
{
    h[0] = v;
    maxh_siftdown(h, len, 0);
}

static int dp_cmp_asc(const void *pa, const void *pb)
{
    const DP *a = (const DP *)pa, *b = (const DP *)pb;
    if (a->d < b->d) return -1;
    if (a->d > b->d) return 1;
    if (a->p < b->p) return -1;
    if (a->p > b->p) return 1;
    return 0;
}

/* ---- adjacency layout --------------------------------------------
 * Node p owns layers 0..levels[p]. Per-(node, layer) blocks live in
 * adj_flat; their start slots are given EXPLICITLY via lay_off, and
 * their current lengths via adj_cnt, both indexed cnt_off[p] + l
 * (cnt_off[p] = prefix sum of levels[q]+1 over q < p). The build
 * wrapper sizes blocks at capacity+1 (2m+1 at layer 0, m+1 above:
 * one transient overflow slot before the prune); the search wrapper
 * passes a tight packed layout — the kernel never assumes a stride.
 */

typedef struct {
    const double *Xn;
    i64 n, d, m;
    const i64 *levels;
    i64 *adj_flat;
    i64 *adj_cnt;
    const i64 *lay_off;
    const i64 *cnt_off;
} Graph;

static inline i64 *layer_slots(const Graph *g, i64 p, i64 l)
{
    return g->adj_flat + g->lay_off[g->cnt_off[p] + l];
}

static inline i64 *layer_cnt(const Graph *g, i64 p, i64 l)
{
    return g->adj_cnt + g->cnt_off[p] + l;
}

/* ---- beam search on one layer (exact _search_layer port) --------- */

typedef struct {
    DP *cand;       /* min-heap buffer, capacity n + ef + 8 */
    DP *res;        /* max-heap buffer */
    i64 *visited;   /* epoch stamps, length n */
    i64 epoch;
    double *tmp;    /* length d */
} Scratch;

static i64 search_layer(const Graph *g, const double *q,
                        const DP *entries, i64 n_e, i64 ef, i64 level,
                        Scratch *s, DP *out)
{
    i64 c_len = 0, r_len = 0;
    s->epoch++;
    for (i64 i = 0; i < n_e; i++) {
        s->visited[entries[i].p] = s->epoch;
        minh_push(s->cand, &c_len, entries[i]);
        maxh_push(s->res, &r_len, entries[i]);
    }
    while (r_len > ef)
        maxh_pop(s->res, &r_len);
    while (c_len) {
        DP c = minh_pop(s->cand, &c_len);
        if (r_len >= ef && c.d > s->res[0].d)
            break;
        if (level > g->levels[c.p])
            continue;
        const i64 *nbrs = layer_slots(g, c.p, level);
        i64 cnt = *layer_cnt(g, c.p, level);
        for (i64 k = 0; k < cnt; k++) {
            i64 nb = nbrs[k];
            if (s->visited[nb] == s->epoch)
                continue;
            s->visited[nb] = s->epoch;
            double nd = sqdist(g->Xn + nb * g->d, q, g->d, s->tmp);
            DP v = { nd, nb };
            if (r_len < ef) {
                maxh_push(s->res, &r_len, v);
                minh_push(s->cand, &c_len, v);
            } else if (nd < s->res[0].d) {
                maxh_replace(s->res, r_len, v);
                minh_push(s->cand, &c_len, v);
            }
        }
    }
    memcpy(out, s->res, (size_t)r_len * sizeof(DP));
    qsort(out, (size_t)r_len, sizeof(DP), dp_cmp_asc);
    return r_len;
}

/* ---- neighbor selection heuristic (exact _select_heuristic port) -
 * keep iff closer to the base than to every already-kept member;
 * pruned candidates backfill nearest-first. cand ascending (d, p). */
static i64 select_heuristic(const Graph *g, const DP *cand, i64 n_c,
                            i64 cap, double *tmp, DP *sel, DP *rej)
{
    i64 nsel = 0, nrej = 0;
    for (i64 i = 0; i < n_c; i++) {
        if (nsel == cap)
            break;
        int keep = 1;
        for (i64 j = 0; j < nsel; j++) {
            double v = sqdist(g->Xn + sel[j].p * g->d,
                              g->Xn + cand[i].p * g->d, g->d, tmp);
            if (!(cand[i].d < v)) {
                keep = 0;
                break;
            }
        }
        if (keep)
            sel[nsel++] = cand[i];
        else
            rej[nrej++] = cand[i];
    }
    for (i64 r = 0; r < nrej && nsel < cap; r++)
        sel[nsel++] = rej[r];
    qsort(sel, (size_t)nsel, sizeof(DP), dp_cmp_asc);
    return nsel;
}

/* ---- incremental insert build (exact hnsw_build_np port) --------- */

int hnsw_build_kernel(const double *Xn, i64 n, i64 d, const i64 *levels,
                      i64 m, i64 ef_construct, i64 start,
                      i64 *adj_flat, i64 *adj_cnt,
                      const i64 *lay_off, const i64 *cnt_off)
{
    Graph g = { Xn, n, d, m, levels, adj_flat, adj_cnt,
                lay_off, cnt_off };
    i64 heap_cap = n + ef_construct + 16;
    DP *cand = malloc((size_t)heap_cap * sizeof(DP));
    DP *res = malloc((size_t)(ef_construct + 16) * sizeof(DP));
    i64 *visited = calloc((size_t)n, sizeof(i64));
    double *tmp = malloc((size_t)d * sizeof(double));
    i64 out_cap = ef_construct + 16;
    DP *bufs[2];
    bufs[0] = malloc((size_t)out_cap * sizeof(DP));
    bufs[1] = malloc((size_t)out_cap * sizeof(DP));
    /* sel holds the outer selection (≤ m) plus, offset past it, the
     * prune's kept list (≤ 2m) — 4m+4 covers both with slack */
    i64 sel_cap = 4 * m + 4;
    DP *sel = malloc((size_t)sel_cap * sizeof(DP));
    DP *rej = malloc((size_t)(out_cap + sel_cap) * sizeof(DP));
    DP *pairs = malloc((size_t)(2 * m + 2) * sizeof(DP));
    if (!cand || !res || !visited || !tmp || !bufs[0] || !bufs[1]
        || !sel || !rej || !pairs) {
        free(cand); free(res); free(visited); free(tmp);
        free(bufs[0]); free(bufs[1]); free(sel); free(rej); free(pairs);
        return 1;
    }
    Scratch s = { cand, res, visited, 0, tmp };

    i64 entry = -1, entry_level = -1;
    if (start > 0) {
        /* derive_entry over the resumed prefix: min pos of max level */
        i64 top = -1;
        for (i64 p = 0; p < start; p++)
            if (levels[p] > top)
                top = levels[p];
        for (i64 p = 0; p < start; p++)
            if (levels[p] == top) {
                entry = p;
                break;
            }
        entry_level = top;
    }

    for (i64 p = start; p < n; p++) {
        i64 lv = levels[p];
        if (entry < 0) {
            entry = p;
            entry_level = lv;
            continue;
        }
        const double *q = Xn + p * d;
        int cur = 0;
        DP *ep = bufs[cur];
        i64 n_ep = 1;
        ep[0].d = sqdist(Xn + entry * d, q, d, tmp);
        ep[0].p = entry;
        for (i64 lc = entry_level; lc > lv; lc--) {
            i64 cnt2 = search_layer(&g, q, ep, n_ep, 1, lc, &s,
                                    bufs[1 - cur]);
            cur = 1 - cur;
            ep = bufs[cur];
            n_ep = cnt2 > 0 ? 1 : 0;
        }
        i64 top_lc = lv < entry_level ? lv : entry_level;
        for (i64 lc = top_lc; lc >= 0; lc--) {
            i64 n_cand = search_layer(&g, q, ep, n_ep, ef_construct,
                                      lc, &s, bufs[1 - cur]);
            cur = 1 - cur;
            ep = bufs[cur];
            n_ep = n_cand;
            i64 cap = (lc == 0) ? 2 * m : m;
            i64 nsel = select_heuristic(&g, ep, n_cand, m, tmp,
                                        sel, rej);
            for (i64 si = 0; si < nsel; si++) {
                i64 nb = sel[si].p;
                i64 *pl = layer_slots(&g, p, lc);
                i64 *pc = layer_cnt(&g, p, lc);
                pl[(*pc)++] = nb;
                i64 *nl = layer_slots(&g, nb, lc);
                i64 *nc = layer_cnt(&g, nb, lc);
                nl[(*nc)++] = p;
                if (*nc > cap) {
                    for (i64 k = 0; k < *nc; k++) {
                        pairs[k].d = sqdist(g.Xn + nl[k] * d,
                                            g.Xn + nb * d, d, tmp);
                        pairs[k].p = nl[k];
                    }
                    qsort(pairs, (size_t)(*nc), sizeof(DP), dp_cmp_asc);
                    i64 kept = select_heuristic(&g, pairs, *nc, cap,
                                                tmp, sel + nsel, rej);
                    for (i64 k = 0; k < kept; k++)
                        nl[k] = sel[nsel + k].p;
                    *nc = kept;
                }
            }
        }
        if (lv > entry_level) {
            entry = p;
            entry_level = lv;
        }
    }

    free(cand); free(res); free(visited); free(tmp);
    free(bufs[0]); free(bufs[1]); free(sel); free(rej); free(pairs);
    return 0;
}

/* ---- query-time beam over a built segment (hnsw_search_np port,
 * sans the exhaustive ef >= n restart — the wrapper routes that
 * rare exact-twin mode to the Python path). Returns ascending
 * (dist, pos) into out_d/out_p, count via return value. */
int hnsw_search_kernel(const double *Xn, i64 n, i64 d,
                       const i64 *levels, const i64 *adj_flat,
                       const i64 *adj_cnt, const i64 *lay_off,
                       const i64 *cnt_off, const double *q,
                       i64 ef, double *out_d, i64 *out_p)
{
    Graph g = { Xn, n, d, 0, levels, (i64 *)adj_flat, (i64 *)adj_cnt,
                lay_off, cnt_off };
    i64 heap_cap = n + ef + 16;
    DP *cand = malloc((size_t)heap_cap * sizeof(DP));
    DP *res = malloc((size_t)(ef + 16) * sizeof(DP));
    i64 *visited = calloc((size_t)n, sizeof(i64));
    double *tmp = malloc((size_t)d * sizeof(double));
    DP *out = malloc((size_t)(ef + 16) * sizeof(DP));
    if (!cand || !res || !visited || !tmp || !out) {
        free(cand); free(res); free(visited); free(tmp); free(out);
        return -1;
    }
    Scratch s = { cand, res, visited, 0, tmp };

    /* derive_entry: min pos of max level */
    i64 top = -1, entry = 0;
    for (i64 p = 0; p < n; p++)
        if (levels[p] > top)
            top = levels[p];
    for (i64 p = 0; p < n; p++)
        if (levels[p] == top) {
            entry = p;
            break;
        }
    DP ep = { sqdist(Xn + entry * d, q, d, tmp), entry };
    for (i64 lc = top; lc > 0; lc--) {
        i64 cnt2 = search_layer(&g, q, &ep, 1, 1, lc, &s, out);
        if (cnt2 > 0)
            ep = out[0];
    }
    i64 n_res = search_layer(&g, q, &ep, 1, ef, 0, &s, out);
    for (i64 i = 0; i < n_res; i++) {
        out_d[i] = out[i].d;
        out_p[i] = out[i].p;
    }
    free(cand); free(res); free(visited); free(tmp); free(out);
    return (int)n_res;
}
