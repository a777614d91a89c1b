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
