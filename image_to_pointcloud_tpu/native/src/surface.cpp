// Implicit surface reconstruction for arbitrary point clouds.
//
// Native replacement for the capability the reference gets from Open3D's
// create_from_point_cloud_poisson / ball-pivoting (reference
// backend/app.py:283-305): estimate oriented normals by local PCA, build
// a signed-distance field on a uniform grid (Hoppe-style projection onto
// the nearest tangent planes, Gaussian-weighted), and extract the
// isosurface with marching tetrahedra (table-free, watertight across
// shared tet faces). The depth-grid pipeline keeps its exact grid
// triangulation (pipeline/meshing.py); this handles clouds with no known
// topology — the v2 asset path and externally loaded clouds.
//
// C ABI for the ctypes binding in native/__init__.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float len(V3 a) { return std::sqrt(dot(a, a)); }

// Smallest-eigenvalue eigenvector of a symmetric 3x3 (covariance) via
// inverse-power-iteration-free closed approach: full Jacobi rotation
// sweep (robust for the tiny matrices here).
static V3 smallest_eigvec(double c[6]) {
  // c = [xx, xy, xz, yy, yz, zz]
  double a[3][3] = {{c[0], c[1], c[2]}, {c[1], c[3], c[4]}, {c[2], c[4], c[5]}};
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 12; sweep++) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++) {
      for (int q = p + 1; q < 3; q++) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double cs = 1 / std::sqrt(t * t + 1), sn = t * cs;
        for (int k = 0; k < 3; k++) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = cs * akp - sn * akq;
          a[k][q] = sn * akp + cs * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = cs * apk - sn * aqk;
          a[q][k] = sn * apk + cs * aqk;
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = cs * vkp - sn * vkq;
          v[k][q] = sn * vkp + cs * vkq;
        }
      }
    }
  }
  int mi = 0;
  for (int i = 1; i < 3; i++) {
    if (a[i][i] < a[mi][mi]) mi = i;
  }
  return {(float)v[0][mi], (float)v[1][mi], (float)v[2][mi]};
}

// Spatial hash over grid cells of size `cell`.
struct HashGrid {
  float cell;
  V3 origin;
  std::unordered_map<int64_t, std::vector<int32_t>> buckets;

  int64_t key(int ix, int iy, int iz) const {
    return ((int64_t)(ix & 0x1fffff) << 42) | ((int64_t)(iy & 0x1fffff) << 21) |
           (int64_t)(iz & 0x1fffff);
  }
  void insert(const V3* pts, int64_t n) {
    buckets.reserve(n / 2);
    for (int64_t i = 0; i < n; i++) {
      int ix = (int)std::floor((pts[i].x - origin.x) / cell);
      int iy = (int)std::floor((pts[i].y - origin.y) / cell);
      int iz = (int)std::floor((pts[i].z - origin.z) / cell);
      buckets[key(ix, iy, iz)].push_back((int32_t)i);
    }
  }
  // Visit every point in the (2r+1)^3 cell neighborhood of p.
  template <typename F>
  void visit(V3 p, int r, F&& f) const {
    int ix = (int)std::floor((p.x - origin.x) / cell);
    int iy = (int)std::floor((p.y - origin.y) / cell);
    int iz = (int)std::floor((p.z - origin.z) / cell);
    for (int dz = -r; dz <= r; dz++) {
      for (int dy = -r; dy <= r; dy++) {
        for (int dx = -r; dx <= r; dx++) {
          auto it = buckets.find(key(ix + dx, iy + dy, iz + dz));
          if (it == buckets.end()) continue;
          for (int32_t idx : it->second) f(idx);
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// Reconstruct a triangle mesh from an arbitrary point cloud.
//   pts: (n, 3) float32; cols: (n, 3) uint8 (may be null)
//   depth: octree-style resolution exponent; grid res = 1<<depth,
//          clamped to [16, 192] (reference default Poisson depth=8)
//   orient_mode: 0 = normals outward from centroid (closed objects),
//                1 = normals toward the origin (camera-facing depth clouds)
// Outputs are allocated here; free with ipc_surface_release. Returns 0 on
// success, <0 on failure (too few points / degenerate bbox / no surface).
int32_t ipc_surface_reconstruct(const float* pts_in, const uint8_t* cols_in,
                                int64_t n, int32_t depth, int32_t orient_mode,
                                float** out_verts, uint8_t** out_cols,
                                int64_t* out_nv, int32_t** out_faces,
                                int64_t* out_nf) {
  *out_verts = nullptr;
  *out_cols = nullptr;
  *out_faces = nullptr;
  *out_nv = 0;
  *out_nf = 0;
  if (n < 16) return -1;
  const V3* pts = (const V3*)pts_in;

  // Bounding box, padded so the surface never clips the grid boundary.
  V3 lo = pts[0], hi = pts[0];
  for (int64_t i = 1; i < n; i++) {
    lo.x = std::min(lo.x, pts[i].x); hi.x = std::max(hi.x, pts[i].x);
    lo.y = std::min(lo.y, pts[i].y); hi.y = std::max(hi.y, pts[i].y);
    lo.z = std::min(lo.z, pts[i].z); hi.z = std::max(hi.z, pts[i].z);
  }
  V3 size = sub(hi, lo);
  float maxdim = std::max(size.x, std::max(size.y, size.z));
  if (maxdim <= 0) return -2;
  float pad = 0.06f * maxdim;
  lo = {lo.x - pad, lo.y - pad, lo.z - pad};
  hi = {hi.x + pad, hi.y + pad, hi.z + pad};
  size = sub(hi, lo);

  int res = 1 << std::min(std::max(depth, 4), 8);
  res = std::min(res, 192);
  float cell = std::max(size.x, std::max(size.y, size.z)) / (float)res;
  int nx = (int)std::ceil(size.x / cell) + 1;
  int ny = (int)std::ceil(size.y / cell) + 1;
  int nz = (int)std::ceil(size.z / cell) + 1;
  auto nidx = [&](int ix, int iy, int iz) -> int64_t {
    return ((int64_t)iz * ny + iy) * nx + ix;
  };

  // Hash the points at a cell size tied to sampling density so radius
  // queries stay O(1): target ~8 points per bucket.
  float hcell = std::max(cell, maxdim / std::cbrt((float)n) * 2.0f);
  HashGrid grid{hcell, lo, {}};
  grid.insert(pts, n);

  // --- Normals: PCA over neighbors within r_n (KDTree-hybrid analog of
  // reference estimate_normals, backend/app.py:283), oriented per mode.
  std::vector<V3> normals(n);
  V3 centroid = {0, 0, 0};
  for (int64_t i = 0; i < n; i++) {
    centroid.x += pts[i].x; centroid.y += pts[i].y; centroid.z += pts[i].z;
  }
  centroid.x /= n; centroid.y /= n; centroid.z /= n;
  float rn = hcell * 1.5f;
  for (int64_t i = 0; i < n; i++) {
    double c[6] = {0, 0, 0, 0, 0, 0};
    double mean[3] = {0, 0, 0};
    int cnt = 0;
    float r = rn;
    for (int attempt = 0; attempt < 2 && cnt < 6; attempt++) {
      c[0] = c[1] = c[2] = c[3] = c[4] = c[5] = 0;
      mean[0] = mean[1] = mean[2] = 0;
      cnt = 0;
      int rr = (int)std::ceil(r / hcell);
      grid.visit(pts[i], rr, [&](int32_t j) {
        V3 d = sub(pts[j], pts[i]);
        if (dot(d, d) > r * r) return;
        mean[0] += pts[j].x; mean[1] += pts[j].y; mean[2] += pts[j].z;
        cnt++;
      });
      if (cnt >= 6) {
        mean[0] /= cnt; mean[1] /= cnt; mean[2] /= cnt;
        grid.visit(pts[i], rr, [&](int32_t j) {
          V3 d = sub(pts[j], pts[i]);
          if (dot(d, d) > r * r) return;
          double dx = pts[j].x - mean[0], dy = pts[j].y - mean[1],
                 dz = pts[j].z - mean[2];
          c[0] += dx * dx; c[1] += dx * dy; c[2] += dx * dz;
          c[3] += dy * dy; c[4] += dy * dz; c[5] += dz * dz;
        });
      }
      r *= 2.0f;
    }
    V3 nrm = cnt >= 6 ? smallest_eigvec(c) : V3{0, 0, 1};
    float l = len(nrm);
    if (l < 1e-12f) nrm = {0, 0, 1}; else { nrm.x /= l; nrm.y /= l; nrm.z /= l; }
    V3 ref = orient_mode == 1
                 ? V3{-pts[i].x, -pts[i].y, -pts[i].z}        // toward origin
                 : sub(pts[i], centroid);                     // away from centroid
    if (dot(nrm, ref) < 0) { nrm.x = -nrm.x; nrm.y = -nrm.y; nrm.z = -nrm.z; }
    normals[i] = nrm;
  }

  // --- Signed distance on grid nodes near the cloud (sparse: only nodes
  // within the support radius of some point are "known").
  float R = 2.2f * std::max(cell, hcell * 0.5f);
  float sigma2 = (R * 0.5f) * (R * 0.5f);
  int64_t nn = (int64_t)nx * ny * nz;
  std::vector<float> fval(nn, 0.0f);
  std::vector<float> wsum(nn, 0.0f);
  int span = (int)std::ceil(R / cell);
  for (int64_t i = 0; i < n; i++) {
    int ix0 = (int)std::floor((pts[i].x - lo.x) / cell);
    int iy0 = (int)std::floor((pts[i].y - lo.y) / cell);
    int iz0 = (int)std::floor((pts[i].z - lo.z) / cell);
    for (int dz = -span; dz <= span + 1; dz++) {
      int iz = iz0 + dz;
      if (iz < 0 || iz >= nz) continue;
      for (int dy = -span; dy <= span + 1; dy++) {
        int iy = iy0 + dy;
        if (iy < 0 || iy >= ny) continue;
        for (int dx = -span; dx <= span + 1; dx++) {
          int ix = ix0 + dx;
          if (ix < 0 || ix >= nx) continue;
          V3 node = {lo.x + ix * cell, lo.y + iy * cell, lo.z + iz * cell};
          V3 d = sub(node, pts[i]);
          float d2 = dot(d, d);
          if (d2 > R * R) continue;
          float w = std::exp(-d2 / sigma2);
          int64_t id = nidx(ix, iy, iz);
          fval[id] += w * dot(d, normals[i]);
          wsum[id] += w;
        }
      }
    }
  }
  const float WMIN = 1e-4f;
  for (int64_t i = 0; i < nn; i++) {
    if (wsum[i] > WMIN) fval[i] /= wsum[i];
  }

  // --- Marching tetrahedra over cubes whose 8 corners are all known.
  // Each cube splits into 6 tets around the main diagonal (0,7); shared
  // tet faces make the extraction crack-free without case tables.
  static const int TETS[6][4] = {{0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
                                 {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7}};
  std::vector<float> verts;
  std::vector<float> outward;  // per-vertex inside→outside direction
  std::vector<int32_t> faces;
  std::unordered_map<int64_t, int32_t> edge_cache;
  auto edge_vertex = [&](int64_t na, int64_t nb, V3 pa, V3 pb, float fa,
                         float fb) -> int32_t {
    int64_t k = na < nb ? (na << 32) | nb : (nb << 32) | na;
    auto it = edge_cache.find(k);
    if (it != edge_cache.end()) return it->second;
    float t = fa / (fa - fb);
    t = std::min(1.0f, std::max(0.0f, t));
    int32_t id = (int32_t)(verts.size() / 3);
    verts.push_back(pa.x + t * (pb.x - pa.x));
    verts.push_back(pa.y + t * (pb.y - pa.y));
    verts.push_back(pa.z + t * (pb.z - pa.z));
    // f increases from the inside (f<0) node to the outside node.
    V3 o = fa < fb ? sub(pb, pa) : sub(pa, pb);
    outward.push_back(o.x);
    outward.push_back(o.y);
    outward.push_back(o.z);
    edge_cache.emplace(k, id);
    return id;
  };

  for (int iz = 0; iz < nz - 1; iz++) {
    for (int iy = 0; iy < ny - 1; iy++) {
      for (int ix = 0; ix < nx - 1; ix++) {
        int64_t corner[8];
        V3 cpos[8];
        float cf[8];
        bool known = true;
        for (int k = 0; k < 8; k++) {
          int cx = ix + (k & 1), cy = iy + ((k >> 1) & 1), cz = iz + (k >> 2);
          corner[k] = nidx(cx, cy, cz);
          if (wsum[corner[k]] <= WMIN) { known = false; break; }
          cpos[k] = {lo.x + cx * cell, lo.y + cy * cell, lo.z + cz * cell};
          cf[k] = fval[corner[k]];
        }
        if (!known) continue;
        for (const auto& tet : TETS) {
          int a = tet[0], b = tet[1], cc = tet[2], d = tet[3];
          // Classify: bit set = inside (f < 0).
          int code = (cf[a] < 0) | ((cf[b] < 0) << 1) | ((cf[cc] < 0) << 2) |
                     ((cf[d] < 0) << 3);
          if (code == 0 || code == 15) continue;
          // Gather crossing edges of the tet in a canonical order per case.
          auto ev = [&](int u, int v) {
            return edge_vertex(corner[u], corner[v], cpos[u], cpos[v], cf[u],
                               cf[v]);
          };
          int32_t t0, t1, t2, t3;
          switch (code) {
            // One vertex inside → one triangle.
            case 1:  faces.insert(faces.end(), {ev(a,b), ev(a,cc), ev(a,d)}); break;
            case 2:  faces.insert(faces.end(), {ev(b,a), ev(b,d), ev(b,cc)}); break;
            case 4:  faces.insert(faces.end(), {ev(cc,a), ev(cc,b), ev(cc,d)}); break;
            case 8:  faces.insert(faces.end(), {ev(d,a), ev(d,cc), ev(d,b)}); break;
            // One vertex outside → one triangle (reversed winding).
            case 14: faces.insert(faces.end(), {ev(a,b), ev(a,d), ev(a,cc)}); break;
            case 13: faces.insert(faces.end(), {ev(b,a), ev(b,cc), ev(b,d)}); break;
            case 11: faces.insert(faces.end(), {ev(cc,a), ev(cc,d), ev(cc,b)}); break;
            case 7:  faces.insert(faces.end(), {ev(d,a), ev(d,b), ev(d,cc)}); break;
            // Two-and-two → quad as two triangles.
            case 3:   // a,b inside
              t0 = ev(a,cc); t1 = ev(a,d); t2 = ev(b,d); t3 = ev(b,cc);
              faces.insert(faces.end(), {t0, t1, t2, t0, t2, t3});
              break;
            case 12:  // cc,d inside (complement of 3, reversed)
              t0 = ev(a,cc); t1 = ev(a,d); t2 = ev(b,d); t3 = ev(b,cc);
              faces.insert(faces.end(), {t0, t2, t1, t0, t3, t2});
              break;
            case 5:   // a,cc inside
              t0 = ev(a,b); t1 = ev(a,d); t2 = ev(cc,d); t3 = ev(cc,b);
              faces.insert(faces.end(), {t0, t2, t1, t0, t3, t2});
              break;
            case 10:  // b,d inside (complement of 5)
              t0 = ev(a,b); t1 = ev(a,d); t2 = ev(cc,d); t3 = ev(cc,b);
              faces.insert(faces.end(), {t0, t1, t2, t0, t2, t3});
              break;
            case 6:   // b,cc inside
              t0 = ev(b,a); t1 = ev(b,d); t2 = ev(cc,d); t3 = ev(cc,a);
              faces.insert(faces.end(), {t0, t1, t2, t0, t2, t3});
              break;
            case 9:   // a,d inside (complement of 6)
              t0 = ev(b,a); t1 = ev(b,d); t2 = ev(cc,d); t3 = ev(cc,a);
              faces.insert(faces.end(), {t0, t2, t1, t0, t3, t2});
              break;
          }
        }
      }
    }
  }

  int64_t nv = (int64_t)(verts.size() / 3);
  int64_t nf = (int64_t)(faces.size() / 3);
  if (nf == 0) return -3;

  // Consistent winding: flip any triangle whose geometric normal points
  // against the SDF outward direction at its vertices (more robust than
  // per-case winding tables).
  for (int64_t f = 0; f < nf; f++) {
    int32_t a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    V3 pa = {verts[3 * a], verts[3 * a + 1], verts[3 * a + 2]};
    V3 pb = {verts[3 * b], verts[3 * b + 1], verts[3 * b + 2]};
    V3 pc = {verts[3 * c], verts[3 * c + 1], verts[3 * c + 2]};
    V3 e1 = sub(pb, pa), e2 = sub(pc, pa);
    V3 nrm = {e1.y * e2.z - e1.z * e2.y, e1.z * e2.x - e1.x * e2.z,
              e1.x * e2.y - e1.y * e2.x};
    V3 o = {outward[3 * a] + outward[3 * b] + outward[3 * c],
            outward[3 * a + 1] + outward[3 * b + 1] + outward[3 * c + 1],
            outward[3 * a + 2] + outward[3 * b + 2] + outward[3 * c + 2]};
    if (dot(nrm, o) < 0) std::swap(faces[3 * f + 1], faces[3 * f + 2]);
  }

  // --- Vertex colors: nearest input point (colors travel with geometry,
  // like Open3D's per-vertex colors after reconstruction).
  uint8_t* vcols = new uint8_t[nv * 3];
  for (int64_t i = 0; i < nv; i++) {
    V3 p = {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
    float best = 1e30f;
    int32_t bi = -1;
    for (int r = 1; r <= 4 && bi < 0; r *= 2) {
      grid.visit(p, r, [&](int32_t j) {
        V3 d = sub(pts[j], p);
        float d2 = dot(d, d);
        if (d2 < best) { best = d2; bi = j; }
      });
    }
    if (bi >= 0 && cols_in) {
      vcols[3 * i] = cols_in[3 * bi];
      vcols[3 * i + 1] = cols_in[3 * bi + 1];
      vcols[3 * i + 2] = cols_in[3 * bi + 2];
    } else {
      vcols[3 * i] = vcols[3 * i + 1] = vcols[3 * i + 2] = 180;
    }
  }

  float* v_out = new float[verts.size()];
  std::memcpy(v_out, verts.data(), verts.size() * sizeof(float));
  int32_t* f_out = new int32_t[faces.size()];
  std::memcpy(f_out, faces.data(), faces.size() * sizeof(int32_t));
  *out_verts = v_out;
  *out_cols = vcols;
  *out_faces = f_out;
  *out_nv = nv;
  *out_nf = nf;
  return 0;
}

void ipc_surface_release(float* verts, uint8_t* cols, int32_t* faces) {
  delete[] verts;
  delete[] cols;
  delete[] faces;
}

}  // extern "C"
