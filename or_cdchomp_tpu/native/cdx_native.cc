// Native host-side runtime components for or_cdchomp_tpu.
//
// The reference implements its entire runtime in C (libcd) / C++
// (plugin).  The TPU build keeps the compute path in XLA, but the
// host-side runtime pieces that the reference implements natively are
// native here too, exposed through a plain C ABI consumed via ctypes:
//
//  - cdx_shparse:   POSIX-shell-like tokenizer
//                   (parity: src/libcd/util_shparse.c:37-128)
//  - cdx_sedt_1d /
//    cdx_sedt_3d:   exact Felzenszwalb-Huttenlocher squared EDT
//                   (parity: src/libcd/grid.c:269-329 / 462-569);
//                   O(n) per scan line — the fast host path for very
//                   large SDF grids where the TPU's O(n^2)
//                   brute-force line transform is wasteful
//  - cdx_grid_read /
//    cdx_grid_write: raw binary grid cache IO with size validation
//                   (parity: orcdchomp_mod.cpp:416-444 / 570-580)
//
// Build: see Makefile (produces libcdx_native.so).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// shparse
// ---------------------------------------------------------------------------

// Tokenize `text`; writes NUL-separated tokens into `out` (caller
// allocates out_cap bytes) and token count into *ntok.
// Returns 0 on success, -1 on syntax error, -2 if out is too small.
int cdx_shparse(const char* text, char* out, int64_t out_cap,
                int64_t* ntok) {
  int64_t w = 0;
  int64_t count = 0;
  bool in_tok = false;
  auto put = [&](char c) -> bool {
    if (w >= out_cap) return false;
    out[w++] = c;
    return true;
  };
  const char* p = text;
  while (*p) {
    char c = *p;
    if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
      if (in_tok) {
        if (!put('\0')) return -2;
        count++;
        in_tok = false;
      }
      p++;
    } else if (c == '\'') {
      in_tok = true;
      p++;
      while (*p && *p != '\'') {
        if (!put(*p++)) return -2;
      }
      if (!*p) return -1;
      p++;
    } else if (c == '"') {
      in_tok = true;
      p++;
      while (*p && *p != '"') {
        if (*p == '\\' && (p[1] == '"' || p[1] == '\\')) p++;
        if (!put(*p++)) return -2;
      }
      if (!*p) return -1;
      p++;
    } else if (c == '\\') {
      in_tok = true;
      if (!p[1]) return -1;
      if (!put(p[1])) return -2;
      p += 2;
    } else {
      in_tok = true;
      if (!put(c)) return -2;
      p++;
    }
  }
  if (in_tok) {
    if (!put('\0')) return -2;
    count++;
  }
  *ntok = count;
  return 0;
}

// ---------------------------------------------------------------------------
// exact squared EDT (lower-envelope algorithm)
// ---------------------------------------------------------------------------

static void sedt_line(int64_t n, const double* f, double* d, int64_t stride,
                      int* v, double* z) {
  const double INF = std::numeric_limits<double>::infinity();
  int np = 0;
  for (int64_t q = 0; q < n; q++) {
    if (f[q] == INF) continue;
    if (np == 0) {
      np = 1;
      v[0] = static_cast<int>(q);
      z[0] = -INF;
      z[1] = INF;
      continue;
    }
    double s;
    for (;;) {
      s = (f[q] + static_cast<double>(q) * q -
           (f[v[np - 1]] + static_cast<double>(v[np - 1]) * v[np - 1])) /
          (2.0 * (q - v[np - 1]));
      if (s <= z[np - 1]) {
        np--;
        if (np == 0) { s = -INF; break; }
      } else {
        break;
      }
    }
    np++;
    v[np - 1] = static_cast<int>(q);
    z[np - 1] = s;
    z[np] = INF;
  }
  if (np == 0) {
    for (int64_t q = 0; q < n; q++) d[q * stride] = INF;
    return;
  }
  int k = 0;
  for (int64_t q = 0; q < n; q++) {
    while (z[k + 1] < static_cast<double>(q)) k++;
    double dq = static_cast<double>(q) - v[k];
    d[q * stride] = dq * dq + f[v[k]];
  }
}

// In-place 3-d squared EDT over a row-major (nx, ny, nz) grid with
// per-axis metric scaling res2[axis] = (length/size)^2.
int cdx_sedt_3d(double* grid, int64_t nx, int64_t ny, int64_t nz,
                const double* res2) {
  int64_t sizes[3] = {nx, ny, nz};
  int64_t strides[3] = {ny * nz, nz, 1};
  int64_t maxn = nx > ny ? (nx > nz ? nx : nz) : (ny > nz ? ny : nz);
  std::vector<double> f(maxn), z(maxn + 1);
  std::vector<int> v(maxn);

  for (int axis = 0; axis < 3; axis++) {
    int64_t n = sizes[axis];
    int64_t stride = strides[axis];
    double r2 = res2[axis];
    int a1 = (axis + 1) % 3, a2 = (axis + 2) % 3;
    for (int64_t i = 0; i < sizes[a1]; i++) {
      for (int64_t j = 0; j < sizes[a2]; j++) {
        double* line = grid + i * strides[a1] + j * strides[a2];
        for (int64_t q = 0; q < n; q++) f[q] = line[q * stride] / r2;
        sedt_line(n, f.data(), line, stride, v.data(), z.data());
        for (int64_t q = 0; q < n; q++) line[q * stride] *= r2;
      }
    }
  }
  return 0;
}

// Signed distance field from a uint8 occupancy grid (1 = obstacle):
// sqrt(sedt_obs) - sqrt(sedt_free)  (parity: grid.c:637-687).
int cdx_signed_edt(const uint8_t* occ, double* out, int64_t nx, int64_t ny,
                   int64_t nz, const double* res2) {
  const double INF = std::numeric_limits<double>::infinity();
  int64_t ncell = nx * ny * nz;
  std::vector<double> d_obs(ncell), d_free(ncell);
  for (int64_t i = 0; i < ncell; i++) {
    d_obs[i] = occ[i] ? 0.0 : INF;
    d_free[i] = occ[i] ? INF : 0.0;
  }
  cdx_sedt_3d(d_obs.data(), nx, ny, nz, res2);
  cdx_sedt_3d(d_free.data(), nx, ny, nz, res2);
  for (int64_t i = 0; i < ncell; i++) {
    out[i] = std::sqrt(d_obs[i]) - std::sqrt(d_free[i]);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// raw binary grid cache (reference cache format: raw cell bytes)
// ---------------------------------------------------------------------------

// Returns 0 ok; -1 open failure; -2 size mismatch; -3 short read.
int cdx_grid_read(const char* path, void* data, int64_t nbytes) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  std::fseek(fp, 0L, SEEK_END);
  if (std::ftell(fp) != static_cast<long>(nbytes)) {
    std::fclose(fp);
    return -2;
  }
  std::fseek(fp, 0L, SEEK_SET);
  size_t got = std::fread(data, 1, static_cast<size_t>(nbytes), fp);
  std::fclose(fp);
  return got == static_cast<size_t>(nbytes) ? 0 : -3;
}

int cdx_grid_write(const char* path, const void* data, int64_t nbytes) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  size_t put = std::fwrite(data, 1, static_cast<size_t>(nbytes), fp);
  std::fclose(fp);
  return put == static_cast<size_t>(nbytes) ? 0 : -3;
}

}  // extern "C"
