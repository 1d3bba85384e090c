// Native host-side runtime kernels for lsc_planner_tpu.
//
// The reference's runtime is C++ (octomap/dynamicEDT3D world handling and
// the vendored Astar-3D grid search); this library provides the same
// host-side services natively -- the TPU compute path stays JAX/XLA:
//   * .bt binary-octree parsing + dense rasterization
//     (octomap::OcTree::readBinary analog; format: text header then a
//     depth-first stream of 2-bit-per-child descriptors)
//   * exact 3-D squared euclidean distance transform (Felzenszwalb),
//     the dynamicEDT3D::update analog
//   * 6-connected grid A* (binary heap), matching the reference's
//     Astar-3D defaults (allowdiagonal=false, euclidean heuristic),
//     used as a ground-truth oracle for the batched wavefront planner.
//
// C ABI only (loaded via ctypes; no pybind11 dependency).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <queue>
#include <string>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

constexpr int kTreeDepth = 16;
constexpr int64_t kKeyOffset = 32768;

struct BtData {
    double resolution = 0.0;
    // occupied leaf cubes: low-corner voxel key (offset-corrected) + size
    std::vector<int64_t> occ_low;   // 3 per leaf
    std::vector<int64_t> occ_size;  // 1 per leaf
};

bool parse_bt(const char* path, BtData* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> data(size);
    if (std::fread(data.data(), 1, size, f) != static_cast<size_t>(size)) {
        std::fclose(f);
        return false;
    }
    std::fclose(f);

    // header: lines until "data"
    size_t pos = 0;
    bool have_res = false;
    while (pos < data.size()) {
        size_t eol = pos;
        while (eol < data.size() && data[eol] != '\n') ++eol;
        std::string line(reinterpret_cast<char*>(&data[pos]), eol - pos);
        pos = eol + 1;
        if (!line.empty() && line[0] == '#') continue;
        if (line == "data") break;
        if (line.rfind("res ", 0) == 0) {
            out->resolution = std::stod(line.substr(4));
            have_res = true;
        }
    }
    if (!have_res) return false;

    // iterative DFS over the node stream
    struct Node { int64_t x, y, z; int depth; };
    std::vector<Node> stack;
    stack.push_back({0, 0, 0, 0});
    while (!stack.empty()) {
        Node nd = stack.back();
        stack.pop_back();
        if (pos + 1 >= data.size()) return false;
        unsigned b1 = data[pos], b2 = data[pos + 1];
        pos += 2;
        int64_t half = int64_t(1) << (kTreeDepth - nd.depth - 1);
        Node inner[8];
        int n_inner = 0;
        for (int i = 0; i < 8; ++i) {
            unsigned byte = i < 4 ? b1 : b2;
            int j = i < 4 ? i : i - 4;
            int bit1 = (byte >> (2 * j)) & 1;
            int bit2 = (byte >> (2 * j + 1)) & 1;
            int64_t cx = nd.x + ((i & 1) ? half : 0);
            int64_t cy = nd.y + ((i & 2) ? half : 0);
            int64_t cz = nd.z + ((i & 4) ? half : 0);
            if (bit1 && bit2) {
                inner[n_inner++] = {cx, cy, cz, nd.depth + 1};
            } else if (bit1) {
                out->occ_low.push_back(cx - kKeyOffset);
                out->occ_low.push_back(cy - kKeyOffset);
                out->occ_low.push_back(cz - kKeyOffset);
                out->occ_size.push_back(half);
            }
        }
        for (int i = n_inner - 1; i >= 0; --i) stack.push_back(inner[i]);
    }
    return true;
}

// 1-D squared distance transform (Felzenszwalb & Huttenlocher)
void dt1d(const float* f, float* d, int n, int* v, float* z) {
    int k = 0;
    v[0] = 0;
    z[0] = -std::numeric_limits<float>::infinity();
    z[1] = std::numeric_limits<float>::infinity();
    for (int q = 1; q < n; ++q) {
        float s;
        while (true) {
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) /
                (2.0f * q - 2.0f * v[k]);
            if (s <= z[k]) {
                --k;
            } else {
                break;
            }
        }
        ++k;
        v[k] = q;
        z[k] = s;
        z[k + 1] = std::numeric_limits<float>::infinity();
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (z[k + 1] < q) ++k;
        d[q] = (q - v[k]) * (q - v[k]) + f[v[k]];
    }
}

}  // namespace

extern "C" {

// Returns resolution, or <= 0 on failure.
double lsc_bt_resolution(const char* path) {
    BtData bt;
    if (!parse_bt(path, &bt)) return -1.0;
    return bt.resolution;
}

// Rasterize occupied leaves into a dense uint8 grid covering voxel keys
// [k0, k0+dims).  Returns 0 on success.
int lsc_bt_rasterize(const char* path, const int64_t* k0,
                     const int64_t* dims, uint8_t* occ) {
    BtData bt;
    if (!parse_bt(path, &bt)) return 1;
    const int64_t X = dims[0], Y = dims[1], Z = dims[2];
    std::memset(occ, 0, X * Y * Z);
    const size_t n = bt.occ_size.size();
    for (size_t c = 0; c < n; ++c) {
        int64_t s = bt.occ_size[c];
        int64_t lo[3], hi[3];
        bool empty = false;
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::max<int64_t>(bt.occ_low[3 * c + a] - k0[a], 0);
            hi[a] = std::min<int64_t>(bt.occ_low[3 * c + a] + s - k0[a],
                                      dims[a]);
            if (lo[a] >= hi[a]) empty = true;
        }
        if (empty) continue;
        for (int64_t i = lo[0]; i < hi[0]; ++i)
            for (int64_t j = lo[1]; j < hi[1]; ++j)
                std::memset(&occ[(i * Y + j) * Z + lo[2]], 1,
                            hi[2] - lo[2]);
    }
    return 0;
}

// Exact euclidean distance transform of the free space: out[i] = distance
// (metric) from cell center to nearest occupied cell center, clamped at
// maxdist.  occ: X*Y*Z row-major (z fastest).
void lsc_edt3d(const uint8_t* occ, int64_t X, int64_t Y, int64_t Z,
               double res, double maxdist, float* out) {
    const float INF = 1e12f;
    const int64_t n = X * Y * Z;
    std::vector<float> g(n);
    for (int64_t i = 0; i < n; ++i) g[i] = occ[i] ? 0.0f : INF;

    int max_dim = static_cast<int>(std::max({X, Y, Z}));
    std::vector<float> fbuf(max_dim), dbuf(max_dim), zbuf(max_dim + 1);
    std::vector<int> vbuf(max_dim);

    // pass 1: along z (contiguous)
    for (int64_t i = 0; i < X; ++i)
        for (int64_t j = 0; j < Y; ++j) {
            float* row = &g[(i * Y + j) * Z];
            dt1d(row, dbuf.data(), Z, vbuf.data(), zbuf.data());
            std::memcpy(row, dbuf.data(), Z * sizeof(float));
        }
    // pass 2: along y
    for (int64_t i = 0; i < X; ++i)
        for (int64_t k = 0; k < Z; ++k) {
            for (int64_t j = 0; j < Y; ++j)
                fbuf[j] = g[(i * Y + j) * Z + k];
            dt1d(fbuf.data(), dbuf.data(), Y, vbuf.data(), zbuf.data());
            for (int64_t j = 0; j < Y; ++j)
                g[(i * Y + j) * Z + k] = dbuf[j];
        }
    // pass 3: along x
    for (int64_t j = 0; j < Y; ++j)
        for (int64_t k = 0; k < Z; ++k) {
            for (int64_t i = 0; i < X; ++i)
                fbuf[i] = g[(i * Y + j) * Z + k];
            dt1d(fbuf.data(), dbuf.data(), X, vbuf.data(), zbuf.data());
            for (int64_t i = 0; i < X; ++i)
                g[(i * Y + j) * Z + k] = dbuf[i];
        }

    const float md = static_cast<float>(maxdist);
    for (int64_t i = 0; i < n; ++i) {
        float d = std::sqrt(g[i]) * static_cast<float>(res);
        out[i] = d < md ? d : md;
    }
}

// 6-connected unit-cost A* with euclidean heuristic (the reference
// Astar-3D configuration).  Writes up to max_len cells (i,j,k triples)
// into path_out, start first.  Returns path length in cells, 0 if no
// path, -1 on bad input.
int lsc_astar6(const uint8_t* occ, const int64_t* dims,
               const int64_t* start, const int64_t* goal,
               int64_t* path_out, int64_t max_len) {
    const int64_t X = dims[0], Y = dims[1], Z = dims[2];
    auto idx = [&](int64_t i, int64_t j, int64_t k) {
        return (i * Y + j) * Z + k;
    };
    auto inb = [&](int64_t i, int64_t j, int64_t k) {
        return i >= 0 && i < X && j >= 0 && j < Y && k >= 0 && k < Z;
    };
    if (!inb(start[0], start[1], start[2]) ||
        !inb(goal[0], goal[1], goal[2]))
        return -1;

    const int64_t n = X * Y * Z;
    std::vector<float> gsc(n, std::numeric_limits<float>::infinity());
    std::vector<int32_t> parent(n, -1);
    std::vector<uint8_t> closed(n, 0);

    auto h = [&](int64_t i, int64_t j, int64_t k) {
        double dx = double(i - goal[0]), dy = double(j - goal[1]),
               dz = double(k - goal[2]);
        return static_cast<float>(std::sqrt(dx * dx + dy * dy + dz * dz));
    };

    using QE = std::pair<float, int64_t>;  // (f, cell)
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open;
    int64_t s = idx(start[0], start[1], start[2]);
    gsc[s] = 0.0f;
    open.push({h(start[0], start[1], start[2]), s});
    const int64_t d6[6][3] = {{1, 0, 0}, {-1, 0, 0}, {0, 1, 0},
                              {0, -1, 0}, {0, 0, 1}, {0, 0, -1}};
    int64_t found = -1;
    while (!open.empty()) {
        auto [f, c] = open.top();
        open.pop();
        if (closed[c]) continue;
        closed[c] = 1;
        int64_t ci = c / (Y * Z), cj = (c / Z) % Y, ck = c % Z;
        if (ci == goal[0] && cj == goal[1]) {  // reference ignores z
            found = c;
            break;
        }
        for (auto& d : d6) {
            int64_t ni = ci + d[0], nj = cj + d[1], nk = ck + d[2];
            if (!inb(ni, nj, nk)) continue;
            int64_t nc = idx(ni, nj, nk);
            if (occ[nc] || closed[nc]) continue;
            float ng = gsc[c] + 1.0f;
            if (ng < gsc[nc]) {
                gsc[nc] = ng;
                parent[nc] = static_cast<int32_t>(c);
                open.push({ng + h(ni, nj, nk), nc});
            }
        }
    }
    if (found < 0) return 0;
    std::vector<int64_t> rev;
    for (int64_t c = found; c >= 0; c = parent[c]) {
        rev.push_back(c);
        if (parent[c] == c) break;
        if (c == s) break;
    }
    int64_t len = std::min<int64_t>(rev.size(), max_len);
    for (int64_t i = 0; i < len; ++i) {
        int64_t c = rev[rev.size() - 1 - i];
        path_out[3 * i + 0] = c / (Y * Z);
        path_out[3 * i + 1] = (c / Z) % Y;
        path_out[3 * i + 2] = c % Z;
    }
    return static_cast<int>(len);
}

}  // extern "C"
