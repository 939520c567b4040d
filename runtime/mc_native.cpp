// Native marching-tetrahedra polygonizer.
//
// C++ counterpart of mneslam_tpu/ops/mc.py — the host-side half of mesh
// extraction (the SDF grid itself is evaluated on TPU). Fills the role of
// the reference's NumpyMarchingCubes C++/Cython extension
// (/root/reference/NumpyMarchingCubes/marching_cubes/src/marching_cubes.cpp):
// truncation-aware isosurface extraction over a dense volume.
//
// Same clean-room 6-tetrahedra decomposition and 16-case table as the
// Python implementation (kept in lockstep; tests compare the two).
//
// Build: make -C runtime   (g++ -O3 -march=native -shared -fPIC)
// ABI: plain C, loaded from Python via ctypes (runtime/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Cube corners by binary (dx, dy, dz); v index bits: x + 2y + 4z.
const int CORNERS[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1},
};

// Six tetrahedra sharing the 0-7 diagonal (equator walk 1,3,2,6,4,5).
const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

// Tetra edges as local vertex pairs.
const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

// 16-case table: up to 2 triangles of edge ids (-1 = unused).
// Case bit i set <=> tet vertex i inside (value < isovalue).
const int8_t TET_TRIS[16][2][3] = {
    /*0000*/ {{-1, -1, -1}, {-1, -1, -1}},
    /*0001*/ {{0, 1, 2}, {-1, -1, -1}},
    /*0010*/ {{0, 4, 3}, {-1, -1, -1}},
    /*0011*/ {{1, 2, 4}, {1, 4, 3}},
    /*0100*/ {{1, 3, 5}, {-1, -1, -1}},
    /*0101*/ {{0, 2, 5}, {0, 5, 3}},
    /*0110*/ {{0, 4, 5}, {0, 5, 1}},
    /*0111*/ {{2, 4, 5}, {-1, -1, -1}},
    /*1000*/ {{2, 5, 4}, {-1, -1, -1}},
    /*1001*/ {{0, 1, 5}, {0, 5, 4}},
    /*1010*/ {{0, 3, 5}, {0, 5, 2}},
    /*1011*/ {{1, 5, 3}, {-1, -1, -1}},
    /*1100*/ {{1, 3, 4}, {1, 4, 2}},
    /*1101*/ {{0, 3, 4}, {-1, -1, -1}},
    /*1110*/ {{0, 2, 1}, {-1, -1, -1}},
    /*1111*/ {{-1, -1, -1}, {-1, -1, -1}},
};

}  // namespace

extern "C" {

// Polygonize `volume` [nx, ny, nz] (C-order) at `isovalue`.
// Cubes with any corner non-finite or |v - iso| >= truncation (if
// truncation > 0) are skipped. Writes up to max_verts vertices (xyz index
// coordinates, 3 floats each, consecutive triplets = triangles) into
// out_verts. Returns the total number of vertices the surface needs —
// callers grow the buffer and retry if the return exceeds max_verts.
int64_t mtet_polygonize(const float* volume, int64_t nx, int64_t ny, int64_t nz,
                        float isovalue, float truncation,
                        float* out_verts, int64_t max_verts) {
  const int64_t sy = nz;          // stride for y in C-order [x][y][z]
  const int64_t sx = ny * nz;
  int64_t count = 0;

  float f[8];
  for (int64_t x = 0; x + 1 < nx; ++x) {
    for (int64_t y = 0; y + 1 < ny; ++y) {
      const float* base = volume + x * sx + y * sy;
      for (int64_t z = 0; z + 1 < nz; ++z) {
        bool ok = true;
        bool any_in = false, all_in = true;
        for (int c = 0; c < 8; ++c) {
          const float v = base[CORNERS[c][0] * sx + CORNERS[c][1] * sy +
                               CORNERS[c][2] + z];
          if (!std::isfinite(v) ||
              (truncation > 0 && std::fabs(v - isovalue) >= truncation)) {
            ok = false;
            break;
          }
          f[c] = v;
          const bool in = v < isovalue;
          any_in |= in;
          all_in &= in;
        }
        if (!ok || !any_in || all_in) continue;

        for (int t = 0; t < 6; ++t) {
          int caseid = 0;
          for (int v = 0; v < 4; ++v) {
            if (f[TETS[t][v]] < isovalue) caseid |= 1 << v;
          }
          for (int tri = 0; tri < 2; ++tri) {
            if (TET_TRIS[caseid][tri][0] < 0) continue;
            for (int e = 0; e < 3; ++e) {
              const int eid = TET_TRIS[caseid][tri][e];
              const int a = TETS[t][TET_EDGES[eid][0]];
              const int b = TETS[t][TET_EDGES[eid][1]];
              const float fa = f[a], fb = f[b];
              float tt = (isovalue - fa) /
                         (std::fabs(fb - fa) < 1e-12f ? 1e-12f : (fb - fa));
              tt = tt < 0.f ? 0.f : (tt > 1.f ? 1.f : tt);
              if (count < max_verts) {
                float* o = out_verts + count * 3;
                o[0] = float(x) + CORNERS[a][0] + tt * (CORNERS[b][0] - CORNERS[a][0]);
                o[1] = float(y) + CORNERS[a][1] + tt * (CORNERS[b][1] - CORNERS[a][1]);
                o[2] = float(z) + CORNERS[a][2] + tt * (CORNERS[b][2] - CORNERS[a][2]);
              }
              ++count;
            }
          }
        }
      }
    }
  }
  return count;
}

}  // extern "C"
