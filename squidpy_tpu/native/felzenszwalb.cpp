// Felzenszwalb-Huttenlocher graph segmentation (superpixels) for tissue
// detection. Pointer-chasing union-find over sorted edges maps poorly onto
// XLA, so it lives in the native runtime layer next to the watershed.
//
// Behavior mirrors the classic algorithm the reference reaches through
// skimage (/root/reference/src/squidpy/experimental/im/_detect_tissue.py:601-624):
// 8-connected grid graph, edge weight = |gray difference|, merge predicate
// w <= min(int(Ca) + k/|Ca|, int(Cb) + k/|Cb|), then a min-size merge pass,
// then relabeling to consecutive ids starting at 0.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Edge {
    float w;
    int32_t a;
    int32_t b;
};

struct UnionFind {
    std::vector<int32_t> parent;
    std::vector<int32_t> size;
    std::vector<float> internal;  // max edge weight inside the component

    explicit UnionFind(int32_t n) : parent(n), size(n, 1), internal(n, 0.0f) {
        for (int32_t i = 0; i < n; ++i) parent[i] = i;
    }
    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }
    int32_t join(int32_t a, int32_t b, float w) {
        if (size[a] < size[b]) std::swap(a, b);
        parent[b] = a;
        size[a] += size[b];
        internal[a] = w;
        return a;
    }
};

}  // namespace

extern "C" void felzenszwalb(
    const float* img,       // (h, w) grayscale
    int64_t h,
    int64_t w,
    float k,                // scale parameter: larger -> larger components
    int64_t min_size,       // post-merge minimum component size
    int32_t* out_labels     // (h, w) consecutive labels from 0
) {
    const int64_t n = h * w;
    std::vector<Edge> edges;
    edges.reserve(static_cast<size_t>(4 * n));

    auto add_edge = [&](int64_t y0, int64_t x0, int64_t y1, int64_t x1) {
        const int64_t a = y0 * w + x0;
        const int64_t b = y1 * w + x1;
        edges.push_back({std::fabs(img[a] - img[b]),
                         static_cast<int32_t>(a), static_cast<int32_t>(b)});
    };
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            if (x + 1 < w) add_edge(y, x, y, x + 1);
            if (y + 1 < h) add_edge(y, x, y + 1, x);
            if (x + 1 < w && y + 1 < h) add_edge(y, x, y + 1, x + 1);
            if (x + 1 < w && y > 0) add_edge(y, x, y - 1, x + 1);
        }
    }
    std::stable_sort(edges.begin(), edges.end(),
                     [](const Edge& e1, const Edge& e2) { return e1.w < e2.w; });

    UnionFind uf(static_cast<int32_t>(n));
    for (const Edge& e : edges) {
        const int32_t ra = uf.find(e.a);
        const int32_t rb = uf.find(e.b);
        if (ra == rb) continue;
        const float ta = uf.internal[ra] + k / static_cast<float>(uf.size[ra]);
        const float tb = uf.internal[rb] + k / static_cast<float>(uf.size[rb]);
        if (e.w <= std::min(ta, tb)) uf.join(ra, rb, e.w);
    }
    if (min_size > 1) {
        for (const Edge& e : edges) {
            const int32_t ra = uf.find(e.a);
            const int32_t rb = uf.find(e.b);
            if (ra != rb && (uf.size[ra] < min_size || uf.size[rb] < min_size)) {
                uf.join(ra, rb, e.w);
            }
        }
    }

    // consecutive relabel, first-touch order (row-major)
    std::vector<int32_t> remap(n, -1);
    int32_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t r = uf.find(static_cast<int32_t>(i));
        if (remap[r] < 0) remap[r] = next++;
        out_labels[i] = remap[r];
    }
}
