// Native mesh-cooking kernels (the meshoptimizer role in the reference:
// meshopt_buildMeshlets et al., used by SceneLoader::ProcessMeshes,
// src/SceneLoader.cpp:2055-2108).
//
// The greedy meshlet scan is inherently sequential per primitive (a running
// vertex-set under budget constraints), which makes it the one cook stage that
// cannot be vectorized with numpy — so it lives here as C++ invoked via ctypes
// (hobbyrenderer_tpu/native/build.py). The Python implementation in
// scene/cooker.py remains as the portable fallback and as the reference for
// the equality test (tests/test_native.py).

#include <cstdint>
#include <cstring>

extern "C" {

// Greedy meshlet build over pre-ordered triangles (caller provides spatial
// ordering, e.g. Morton). Outputs are caller-allocated at worst case:
//   ml_vert_offset/ml_vert_count/ml_tri_offset/ml_tri_count: n_tris entries
//   ml_vertices: n_tris * 3 entries, ml_tris: n_tris * 3 entries (local idx)
// Returns the number of meshlets.
int build_meshlets(const int32_t* tris,      // (n_tris, 3) vertex indices
                   int32_t n_tris,
                   int32_t n_verts,
                   int32_t max_verts,        // 64 (ref Common.sr:53-55)
                   int32_t max_tris,         // 96
                   int32_t* ml_vert_offset,
                   int32_t* ml_vert_count,
                   int32_t* ml_tri_offset,
                   int32_t* ml_tri_count,
                   int32_t* ml_vertices,     // global vertex ids
                   int32_t* ml_tris)         // meshlet-local triples
{
    // vertex -> local slot map for the CURRENT meshlet; 0xFFFFFFFF = absent
    int32_t* slot = new int32_t[n_verts];
    memset(slot, 0xFF, sizeof(int32_t) * n_verts);

    int n_meshlets = 0;
    int cur_v = 0;          // vertices in current meshlet
    int cur_t = 0;          // triangles in current meshlet
    int out_v = 0;          // total emitted meshlet-vertices
    int out_t = 0;          // total emitted meshlet-triangles

    int cur_vstart = 0;
    int cur_tstart = 0;

    auto flush = [&]() {
        if (cur_t == 0) return;
        ml_vert_offset[n_meshlets] = cur_vstart;
        ml_vert_count[n_meshlets] = cur_v;
        ml_tri_offset[n_meshlets] = cur_tstart;
        ml_tri_count[n_meshlets] = cur_t;
        n_meshlets++;
        // reset the slot map for the vertices we used
        for (int i = cur_vstart; i < cur_vstart + cur_v; ++i)
            slot[ml_vertices[i]] = -1;
        cur_vstart = out_v;
        cur_tstart = out_t;
        cur_v = 0;
        cur_t = 0;
    };

    for (int t = 0; t < n_tris; ++t) {
        const int32_t a = tris[t * 3 + 0];
        const int32_t b = tris[t * 3 + 1];
        const int32_t c = tris[t * 3 + 2];
        int fresh = (slot[a] < 0) + (slot[b] < 0) + (slot[c] < 0);
        if (cur_v + fresh > max_verts || cur_t + 1 > max_tris) {
            flush();
            fresh = 3;
        }
        int32_t local[3];
        const int32_t v3[3] = {a, b, c};
        for (int k = 0; k < 3; ++k) {
            if (slot[v3[k]] < 0) {
                slot[v3[k]] = cur_v;
                ml_vertices[cur_vstart + cur_v] = v3[k];
                cur_v++;
                out_v++;
            }
            local[k] = slot[v3[k]];
        }
        ml_tris[out_t * 3 + 0] = local[0];
        ml_tris[out_t * 3 + 1] = local[1];
        ml_tris[out_t * 3 + 2] = local[2];
        out_t++;
        cur_t++;
    }
    flush();

    delete[] slot;
    return n_meshlets;
}

// Vertex-cache-friendly triangle reordering by centroid Morton code is done in
// numpy (vectorized); no native counterpart needed.

}  // extern "C"
