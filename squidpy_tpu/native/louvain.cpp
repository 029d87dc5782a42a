// CSR Louvain community detection (modularity optimization with resolution).
//
// Native counterpart of the reference's leidenalg/scanpy clustering backend
// (/root/reference/src/squidpy/gr/_niche.py:399-457 delegates to
// scanpy.tl.leiden -> leidenalg's C core). networkx's pure-Python Louvain is
// minutes-to-hours at 100k-1M cells; this is the same modularity-optimization
// family with O(nnz) local-move passes and graph aggregation, deterministic
// for a given seed.
//
// Input: symmetric CSR (each undirected edge stored in both rows), no
// self-loops required. Output: community id per node (compact, unordered —
// the Python wrapper renumbers largest-first).

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
    uint64_t next() {
        s ^= s << 13;
        s ^= s >> 7;
        s ^= s << 17;
        return s;
    }
};

struct Level {
    std::vector<int64_t> iptr;
    std::vector<int32_t> idx;
    std::vector<double> w;
    std::vector<double> self_w;  // self-loop weight per node (internal edges)
};

// One Louvain level: local-move passes until stable. Returns number of
// communities; fills node->community (compact ids).
int64_t local_move(const Level& g, double resolution, Rng& rng,
                   std::vector<int32_t>& comm_out) {
    const int64_t n = static_cast<int64_t>(g.iptr.size()) - 1;
    std::vector<double> k(n);  // weighted degree (self-loops count twice)
    double m2 = 0.0;           // 2m
    for (int64_t u = 0; u < n; ++u) {
        double s = 2.0 * g.self_w[u];
        for (int64_t e = g.iptr[u]; e < g.iptr[u + 1]; ++e) s += g.w[e];
        k[u] = s;
        m2 += s;
    }
    if (m2 <= 0.0) {
        std::fill(comm_out.begin(), comm_out.end(), 0);
        return n > 0 ? 1 : 0;
    }

    std::vector<int32_t> comm(n);
    std::iota(comm.begin(), comm.end(), 0);
    std::vector<double> tot(k);  // per-community Σ degrees

    std::vector<double> neigh_w(n, 0.0);  // scratch: weight to each community
    std::vector<int32_t> touched;
    touched.reserve(64);

    std::vector<int64_t> order(n);
    std::iota(order.begin(), order.end(), 0);

    bool moved = true;
    for (int pass = 0; pass < 64 && moved; ++pass) {
        moved = false;
        // Fisher-Yates shuffle for pass-dependent but seed-deterministic order
        for (int64_t i = n - 1; i > 0; --i) {
            int64_t j = static_cast<int64_t>(rng.next() % static_cast<uint64_t>(i + 1));
            std::swap(order[i], order[j]);
        }
        for (int64_t oi = 0; oi < n; ++oi) {
            const int64_t u = order[oi];
            const int32_t cu = comm[u];
            touched.clear();
            for (int64_t e = g.iptr[u]; e < g.iptr[u + 1]; ++e) {
                const int32_t v = g.idx[e];
                if (v == static_cast<int32_t>(u)) continue;
                const int32_t cv = comm[v];
                if (neigh_w[cv] == 0.0) touched.push_back(cv);
                neigh_w[cv] += g.w[e];
            }
            // remove u from its community
            tot[cu] -= k[u];
            // gain of joining community c: k_{u,c} - γ·Σtot_c·k_u/(2m)
            double best_gain = neigh_w[cu] - resolution * tot[cu] * k[u] / m2;
            int32_t best = cu;
            for (int32_t c : touched) {
                const double gain = neigh_w[c] - resolution * tot[c] * k[u] / m2;
                if (gain > best_gain + 1e-12 ||
                    (gain > best_gain - 1e-12 && c < best)) {
                    best_gain = gain;
                    best = c;
                }
            }
            tot[best] += k[u];
            if (best != cu) {
                comm[u] = best;
                moved = true;
            }
            for (int32_t c : touched) neigh_w[c] = 0.0;
        }
    }

    // compact community ids
    std::vector<int32_t> remap(n, -1);
    int32_t n_comm = 0;
    for (int64_t u = 0; u < n; ++u) {
        if (remap[comm[u]] < 0) remap[comm[u]] = n_comm++;
        comm_out[u] = remap[comm[u]];
    }
    return n_comm;
}

// Aggregate communities into a coarser graph.
Level aggregate(const Level& g, const std::vector<int32_t>& comm, int64_t n_comm) {
    const int64_t n = static_cast<int64_t>(g.iptr.size()) - 1;
    Level out;
    out.self_w.assign(n_comm, 0.0);

    // bucket nodes by community for cache-friendly accumulation
    std::vector<int64_t> counts(n_comm + 1, 0);
    for (int64_t u = 0; u < n; ++u) counts[comm[u] + 1]++;
    for (int64_t c = 0; c < n_comm; ++c) counts[c + 1] += counts[c];
    std::vector<int64_t> members(n);
    {
        std::vector<int64_t> fill(counts.begin(), counts.end() - 1);
        for (int64_t u = 0; u < n; ++u) members[fill[comm[u]]++] = u;
    }

    out.iptr.assign(n_comm + 1, 0);
    std::vector<double> acc(n_comm, 0.0);
    std::vector<int32_t> touched;
    touched.reserve(256);
    // two sweeps: size then fill
    std::vector<std::pair<int32_t, double>> edges;  // (dst, w) per community row
    edges.reserve(1024);
    for (int64_t c = 0; c < n_comm; ++c) {
        touched.clear();
        double self_acc = 0.0;
        for (int64_t mi = counts[c]; mi < counts[c + 1]; ++mi) {
            const int64_t u = members[mi];
            self_acc += g.self_w[u];
            for (int64_t e = g.iptr[u]; e < g.iptr[u + 1]; ++e) {
                const int32_t v = g.idx[e];
                if (v == static_cast<int32_t>(u)) {  // stray diagonal entry
                    self_acc += 0.5 * g.w[e];
                    continue;
                }
                const int32_t cv = comm[v];
                if (cv == static_cast<int32_t>(c)) {
                    self_acc += 0.5 * g.w[e];  // intra edge appears twice in CSR
                } else {
                    if (acc[cv] == 0.0) touched.push_back(cv);
                    acc[cv] += g.w[e];
                }
            }
        }
        out.self_w[c] = self_acc;
        std::sort(touched.begin(), touched.end());
        for (int32_t cv : touched) {
            out.idx.push_back(cv);
            out.w.push_back(acc[cv]);
            acc[cv] = 0.0;
        }
        out.iptr[c + 1] = static_cast<int64_t>(out.idx.size());
    }
    return out;
}

}  // namespace

extern "C" int64_t louvain_csr(const int64_t* indptr, const int32_t* indices,
                               const double* weights, int64_t n,
                               double resolution, uint64_t seed,
                               int32_t max_levels, int32_t* labels_out) {
    if (n <= 0) return 0;
    Level g;
    g.iptr.assign(indptr, indptr + n + 1);
    g.idx.assign(indices, indices + indptr[n]);
    g.w.assign(weights, weights + indptr[n]);
    g.self_w.assign(n, 0.0);

    std::vector<int32_t> node2final(n);
    std::iota(node2final.begin(), node2final.end(), 0);
    Rng rng(seed);

    int64_t n_comm = n;
    for (int32_t level = 0; level < max_levels; ++level) {
        const int64_t n_cur = static_cast<int64_t>(g.iptr.size()) - 1;
        std::vector<int32_t> comm(n_cur);
        const int64_t n_new = local_move(g, resolution, rng, comm);
        for (int64_t u = 0; u < n; ++u) node2final[u] = comm[node2final[u]];
        if (n_new == n_cur) {  // no merge happened: converged
            n_comm = n_new;
            break;
        }
        n_comm = n_new;
        g = aggregate(g, comm, n_new);
    }
    std::copy(node2final.begin(), node2final.end(), labels_out);
    return n_comm;
}
