// Native mesh processing for the orbit-tpu asset pipeline.
//
// TPU-native equivalent of the reference's meshopt/rayon asset path
// (src/assets/mesh.rs:292-338 compute_meshlets and friends): the greedy
// meshletizer runs at scene-bake time on the host, and the Python
// implementation's per-triangle dict loop dominates large imports. This
// C++ port implements the exact same algorithm (bit-compatible outputs,
// differential-tested against the Python twin).
//
// Build: g++ -O3 -march=native -shared -fPIC meshproc.cpp -o libmeshproc.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

// Greedy scan meshletizer: <=max_verts vertices / <=max_tris triangles per
// meshlet, split on material change. Returns the meshlet count.
// Outputs are caller-allocated with capacity `cap` meshlets.
int build_meshlets(
    const float* positions,      // [n_verts, 3]
    int32_t n_verts,
    const uint32_t* indices,     // [n_tris * 3]
    int32_t n_tris,
    const int32_t* tri_material, // [n_tris] or nullptr
    int32_t max_verts,
    int32_t max_tris,
    int32_t cap,
    int32_t* mlet_vertices,      // [cap, max_verts]
    int8_t* mlet_tris,           // [cap, max_tris, 3]
    int32_t* mlet_vcount,        // [cap]
    int32_t* mlet_tcount,        // [cap]
    float* mlet_sphere,          // [cap, 4]
    float* mlet_cone,            // [cap, 4]
    int32_t* mlet_material       // [cap]
) {
    std::vector<int32_t> vert_map(n_verts, -1);
    std::vector<int32_t> local_verts;
    std::vector<int8_t> local_tris;  // triplets of local indices
    local_verts.reserve(max_verts);
    local_tris.reserve(max_tris * 3);

    int n_meshlets = 0;
    int cur_material = 0;

    auto finish = [&]() {
        if (local_tris.empty()) return;
        if (n_meshlets >= cap) { local_tris.clear(); return; }
        const int m = n_meshlets++;
        const int nv = (int)local_verts.size();
        const int nt = (int)local_tris.size() / 3;
        for (int i = 0; i < nv; i++)
            mlet_vertices[m * max_verts + i] = local_verts[i];
        for (int i = nv; i < max_verts; i++)
            mlet_vertices[m * max_verts + i] = local_verts[0];
        std::memcpy(mlet_tris + (size_t)m * max_tris * 3,
                    local_tris.data(), local_tris.size());
        std::memset(mlet_tris + (size_t)m * max_tris * 3 + local_tris.size(),
                    0, (size_t)max_tris * 3 - local_tris.size());
        mlet_vcount[m] = nv;
        mlet_tcount[m] = nt;
        mlet_material[m] = cur_material;

        // Ritter bounding sphere over the meshlet's vertices
        // (mirrors assets/mesh.py compute_bounding_sphere)
        auto P = [&](int i, int c) {
            return positions[(size_t)local_verts[i] * 3 + c];
        };
        auto dist2 = [&](int a, const float* q) {
            float dx = P(a,0)-q[0], dy = P(a,1)-q[1], dz = P(a,2)-q[2];
            return dx*dx + dy*dy + dz*dz;
        };
        float x[3] = {P(0,0), P(0,1), P(0,2)};
        int yi = 0; float best = -1;
        for (int i = 0; i < nv; i++) {
            float d = dist2(i, x);
            if (d > best) { best = d; yi = i; }
        }
        float y[3] = {P(yi,0), P(yi,1), P(yi,2)};
        int zi = 0; best = -1;
        for (int i = 0; i < nv; i++) {
            float d = dist2(i, y);
            if (d > best) { best = d; zi = i; }
        }
        float z[3] = {P(zi,0), P(zi,1), P(zi,2)};
        float center[3] = {(y[0]+z[0])*0.5f, (y[1]+z[1])*0.5f, (y[2]+z[2])*0.5f};
        float dyz = std::sqrt((z[0]-y[0])*(z[0]-y[0]) + (z[1]-y[1])*(z[1]-y[1])
                            + (z[2]-y[2])*(z[2]-y[2]));
        float radius = dyz * 0.5f;
        float worst = 0; int wi = 0;
        for (int i = 0; i < nv; i++) {
            float d = std::sqrt(dist2(i, center));
            if (d > worst) { worst = d; wi = i; }
        }
        if (worst > radius) {
            float nr = (radius + worst) * 0.5f;
            float t = (worst - radius) / (2 * worst);
            for (int c = 0; c < 3; c++)
                center[c] += (P(wi, c) - center[c]) * t;
            radius = nr;
            float mx = 0;
            for (int i = 0; i < nv; i++) {
                float d = std::sqrt(dist2(i, center));
                if (d > mx) mx = d;
            }
            if (mx > radius) radius = mx;
        }
        mlet_sphere[m*4+0] = center[0];
        mlet_sphere[m*4+1] = center[1];
        mlet_sphere[m*4+2] = center[2];
        mlet_sphere[m*4+3] = radius * 1.0001f;

        // normal cone: axis = mean face normal, cutoff = sin(max deviation)
        double ax = 0, ay = 0, az = 0;
        std::vector<float> fns;
        fns.reserve(nt * 3);
        for (int t = 0; t < nt; t++) {
            int a = local_tris[t*3], b = local_tris[t*3+1], c = local_tris[t*3+2];
            float e1[3], e2[3];
            for (int k = 0; k < 3; k++) {
                e1[k] = P(b,k) - P(a,k);
                e2[k] = P(c,k) - P(a,k);
            }
            float nx = e1[1]*e2[2] - e1[2]*e2[1];
            float ny = e1[2]*e2[0] - e1[0]*e2[2];
            float nz = e1[0]*e2[1] - e1[1]*e2[0];
            float len = std::sqrt(nx*nx + ny*ny + nz*nz);
            if (len > 1e-12f) {
                nx /= len; ny /= len; nz /= len;
                fns.push_back(nx); fns.push_back(ny); fns.push_back(nz);
                ax += nx; ay += ny; az += nz;
            }
        }
        float axis[3] = {0, 0, 1};
        float mindot = -1.0f;
        double alen = std::sqrt(ax*ax + ay*ay + az*az);
        if (!fns.empty() && alen > 1e-12) {
            axis[0] = (float)(ax / alen);
            axis[1] = (float)(ay / alen);
            axis[2] = (float)(az / alen);
            mindot = 2.0f;
            for (size_t i = 0; i < fns.size(); i += 3) {
                float d = fns[i]*axis[0] + fns[i+1]*axis[1] + fns[i+2]*axis[2];
                if (d < mindot) mindot = d;
            }
        }
        float cutoff = (mindot <= 0.1f) ? 1.0f
                       : std::sqrt(1.0f - mindot * mindot);
        mlet_cone[m*4+0] = axis[0];
        mlet_cone[m*4+1] = axis[1];
        mlet_cone[m*4+2] = axis[2];
        mlet_cone[m*4+3] = cutoff;

        for (int v : local_verts) vert_map[v] = -1;
        local_verts.clear();
        local_tris.clear();
    };

    for (int t = 0; t < n_tris; t++) {
        const uint32_t* tri = indices + (size_t)t * 3;
        const int mat = tri_material ? tri_material[t] : 0;
        int new_verts = 0;
        for (int k = 0; k < 3; k++)
            if (vert_map[tri[k]] < 0) new_verts++;
        // degenerate triangles with repeated NEW vertices count once
        if (tri[0] == tri[1] || tri[1] == tri[2] || tri[0] == tri[2]) {
            new_verts = 0;
            bool seen[3] = {false, false, false};
            for (int k = 0; k < 3; k++) {
                if (vert_map[tri[k]] >= 0) continue;
                bool dup = false;
                for (int j = 0; j < k; j++)
                    if (tri[j] == tri[k]) dup = true;
                if (!dup) new_verts++;
            }
        }
        const bool have = !local_tris.empty();
        if (have && ((int)local_tris.size() / 3 >= max_tris ||
                     (int)local_verts.size() + new_verts > max_verts ||
                     mat != cur_material)) {
            finish();
        }
        if (local_tris.empty()) cur_material = mat;
        for (int k = 0; k < 3; k++) {
            uint32_t v = tri[k];
            if (vert_map[v] < 0) {
                vert_map[v] = (int)local_verts.size();
                local_verts.push_back((int)v);
            }
            local_tris.push_back((int8_t)vert_map[v]);
        }
    }
    finish();
    return n_meshlets;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// QEM half-edge-collapse simplification with border locking.
//
// Replaces the grid-clustering LOD fallback (assets/lod.py) with
// Garland-Heckbert quadric error metrics, matching the role of
// meshopt_simplify in the reference (src/assets/mesh.rs:252-290, which
// locks borders for multi-submesh meshes so LODs never crack at material
// seams). Collapses are HALF-edge (the kept vertex is an existing one),
// so every LOD shares the original vertex buffer exactly like the
// reference's global vertex heap.
//
// Locked vertices (never moved, never merged away):
//   * open-boundary vertices (an edge with exactly one incident triangle)
//   * material-seam vertices (edge shared by triangles of two materials)
//   * attribute-seam vertices (position duplicated across vertices: uv or
//     normal seams created by vertex splitting)

#include <algorithm>
#include <queue>
#include <unordered_map>

namespace {

struct Quadric {
    double m[10];  // symmetric 4x4: a2 ab ac ad b2 bc bd c2 cd d2
    void zero() { for (double& v : m) v = 0.0; }
    void add_plane(double a, double b, double c, double d, double w) {
        m[0] += w * a * a; m[1] += w * a * b; m[2] += w * a * c;
        m[3] += w * a * d; m[4] += w * b * b; m[5] += w * b * c;
        m[6] += w * b * d; m[7] += w * c * c; m[8] += w * c * d;
        m[9] += w * d * d;
    }
    void add(const Quadric& o) { for (int i = 0; i < 10; i++) m[i] += o.m[i]; }
    double eval(double x, double y, double z) const {
        return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z
             + 2 * m[3] * x + m[4] * y * y + 2 * m[5] * y * z
             + 2 * m[6] * y + m[7] * z * z + 2 * m[8] * z + m[9];
    }
};

struct HeapItem {
    double cost;
    int edge;
    uint64_t stamp;  // lazy invalidation
    bool operator<(const HeapItem& o) const { return cost > o.cost; }
};

}  // namespace

extern "C" {

// Returns the simplified triangle count (<= n_tris). out_remap maps each
// vertex to its surviving representative.
int qem_simplify(
    const float* positions,       // [n_verts, 3]
    int32_t n_verts,
    const uint32_t* indices,      // [n_tris * 3]
    int32_t n_tris,
    const int32_t* tri_material,  // [n_tris] or nullptr
    int32_t target_tris,
    int32_t* out_remap,           // [n_verts]
    uint32_t* out_indices,        // [n_tris * 3]
    int32_t* out_tri_mat          // [n_tris] (written iff tri_material)
) {
    std::vector<int32_t> rep(n_verts);
    for (int v = 0; v < n_verts; v++) rep[v] = v;
    auto find = [&](int v) {
        while (rep[v] != v) { rep[v] = rep[rep[v]]; v = rep[v]; }
        return v;
    };

    // vertex quadrics from triangle planes (area-weighted)
    std::vector<Quadric> Q(n_verts);
    for (auto& q : Q) q.zero();
    auto P = [&](int v, int c) { return (double)positions[v * 3 + c]; };
    for (int t = 0; t < n_tris; t++) {
        int a = indices[t * 3], b = indices[t * 3 + 1], c = indices[t * 3 + 2];
        double ux = P(b,0)-P(a,0), uy = P(b,1)-P(a,1), uz = P(b,2)-P(a,2);
        double vx = P(c,0)-P(a,0), vy = P(c,1)-P(a,1), vz = P(c,2)-P(a,2);
        double nx = uy*vz - uz*vy, ny = uz*vx - ux*vz, nz = ux*vy - uy*vx;
        double len = std::sqrt(nx*nx + ny*ny + nz*nz);
        if (len < 1e-30) continue;
        double area = 0.5 * len;
        nx /= len; ny /= len; nz /= len;
        double d = -(nx*P(a,0) + ny*P(a,1) + nz*P(a,2));
        Q[a].add_plane(nx, ny, nz, d, area);
        Q[b].add_plane(nx, ny, nz, d, area);
        Q[c].add_plane(nx, ny, nz, d, area);
    }

    // unique edges + border / material-seam detection
    struct EdgeInfo { int count = 0; int mat = -2; };  // mat -2: unset, -3: mixed
    std::unordered_map<uint64_t, EdgeInfo> edge_map;
    edge_map.reserve((size_t)n_tris * 3);
    auto ekey = [](int a, int b) {
        if (a > b) std::swap(a, b);
        return ((uint64_t)a << 32) | (uint32_t)b;
    };
    for (int t = 0; t < n_tris; t++) {
        int mat = tri_material ? tri_material[t] : 0;
        for (int e = 0; e < 3; e++) {
            int a = indices[t * 3 + e], b = indices[t * 3 + (e + 1) % 3];
            auto& info = edge_map[ekey(a, b)];
            info.count++;
            if (info.mat == -2) info.mat = mat;
            else if (info.mat != mat) info.mat = -3;
        }
    }
    std::vector<uint8_t> locked(n_verts, 0);
    for (auto& kv : edge_map) {
        if (kv.second.count == 1 || kv.second.mat == -3) {
            locked[(int)(kv.first >> 32)] = 1;
            locked[(uint32_t)kv.first] = 1;
        }
    }
    // attribute seams: duplicated positions (split vertices)
    {
        std::vector<int> order(n_verts);
        for (int v = 0; v < n_verts; v++) order[v] = v;
        std::sort(order.begin(), order.end(), [&](int a, int b) {
            for (int c = 0; c < 3; c++) {
                if (P(a,c) != P(b,c)) return P(a,c) < P(b,c);
            }
            return a < b;
        });
        for (int i = 1; i < n_verts; i++) {
            int a = order[i - 1], b = order[i];
            if (P(a,0)==P(b,0) && P(a,1)==P(b,1) && P(a,2)==P(b,2)) {
                locked[a] = 1; locked[b] = 1;
            }
        }
    }

    // vertex -> incident triangle adjacency + live-tri bookkeeping
    std::vector<int> tri_alive(n_tris, 1);
    std::vector<std::vector<int>> vtris(n_verts);
    for (int t = 0; t < n_tris; t++)
        for (int e = 0; e < 3; e++) vtris[indices[t * 3 + e]].push_back(t);

    // candidate edges
    std::vector<std::pair<int,int>> edges;
    edges.reserve(edge_map.size());
    for (auto& kv : edge_map)
        edges.push_back({(int)(kv.first >> 32), (int)(uint32_t)kv.first});

    std::vector<uint64_t> vstamp(n_verts, 0);
    auto edge_cost = [&](int a, int b, int& keep) -> double {
        // half-edge collapse: evaluate (Qa+Qb) at both endpoints, keep
        // the cheaper one; a locked endpoint must be the kept one
        Quadric q = Q[a]; q.add(Q[b]);
        double ca = q.eval(P(a,0), P(a,1), P(a,2));
        double cb = q.eval(P(b,0), P(b,1), P(b,2));
        if (locked[a] && locked[b]) { keep = -1; return 1e300; }
        if (locked[a]) { keep = a; return ca; }
        if (locked[b]) { keep = b; return cb; }
        if (ca <= cb) { keep = a; return ca; }
        keep = b; return cb;
    };

    std::priority_queue<HeapItem> heap;
    for (int i = 0; i < (int)edges.size(); i++) {
        int keep;
        double c = edge_cost(edges[i].first, edges[i].second, keep);
        if (keep >= 0) heap.push({c, i, 0});
    }

    int live = n_tris;
    while (live > target_tris && !heap.empty()) {
        HeapItem it = heap.top(); heap.pop();
        int a = find(edges[it.edge].first), b = find(edges[it.edge].second);
        if (a == b) continue;
        uint64_t stamp = vstamp[a] + vstamp[b];
        if (it.stamp != stamp) {
            // stale: recompute and re-push
            int keep;
            double c = edge_cost(a, b, keep);
            if (keep >= 0) heap.push({c, it.edge, stamp});
            continue;
        }
        int keep;
        edge_cost(a, b, keep);
        if (keep < 0) continue;
        int gone = (keep == a) ? b : a;
        // collapse: gone -> keep
        rep[gone] = keep;
        Q[keep].add(Q[gone]);
        vstamp[keep]++;
        // retire triangles that became degenerate; migrate the rest
        for (int t : vtris[gone]) {
            if (!tri_alive[t]) continue;
            int va = find(indices[t * 3]);
            int vb = find(indices[t * 3 + 1]);
            int vc = find(indices[t * 3 + 2]);
            if (va == vb || vb == vc || va == vc) {
                tri_alive[t] = 0;
                live--;
            } else {
                vtris[keep].push_back(t);
            }
        }
        vtris[gone].clear();
        // re-queue this vertex's edges happens lazily via stamps
    }

    for (int v = 0; v < n_verts; v++) out_remap[v] = find(v);

    // rebuild the index list: drop degenerates + duplicate triangles
    std::unordered_map<uint64_t, int> seen;
    seen.reserve((size_t)live * 2);
    int out = 0;
    for (int t = 0; t < n_tris; t++) {
        if (!tri_alive[t]) continue;
        uint32_t va = out_remap[indices[t * 3]];
        uint32_t vb = out_remap[indices[t * 3 + 1]];
        uint32_t vc = out_remap[indices[t * 3 + 2]];
        if (va == vb || vb == vc || va == vc) continue;
        uint32_t s0 = va, s1 = vb, s2 = vc;
        if (s0 > s1) std::swap(s0, s1);
        if (s1 > s2) std::swap(s1, s2);
        if (s0 > s1) std::swap(s0, s1);
        uint64_t key = ((uint64_t)s0 * 0x9E3779B97F4A7C15ULL) ^
                       ((uint64_t)s1 << 21) ^ ((uint64_t)s2 << 42);
        auto ins = seen.emplace(key, t);
        if (!ins.second) continue;
        out_indices[out * 3] = va;
        out_indices[out * 3 + 1] = vb;
        out_indices[out * 3 + 2] = vc;
        if (tri_material && out_tri_mat) out_tri_mat[out] = tri_material[t];
        out++;
    }
    return out;
}

}  // extern "C"
