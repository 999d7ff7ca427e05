// Native data-plane kernels for the host-side input pipeline.
//
// The reference delegates its data hot path to SimpleITK (ITK C++) for
// affine nearest-neighbor resampling (experiments/data_io/dataset.py:205-237)
// and to numpy masked arrays for z-score normalization
// (experiments/utils.py:43-71). This library provides multithreaded
// C++ equivalents bound via ctypes; the Python implementations remain as
// behavior-identical fallbacks.
//
// Build: make (g++ -O3 -fopenmp -shared).

#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Nearest-neighbor affine resample of one 3D channel.
//   out[z,y,x] = in[round(A @ (z,y,x) + t)]  (zyx index coordinates)
// Rounding is floor(v + 0.5) to match scipy.ndimage order-0 semantics.
void affine_nn_3d(const float* in, float* out,
                  int64_t nz, int64_t ny, int64_t nx,
                  const double* a /* 3x3 row-major */, const double* t,
                  float cval) {
#pragma omp parallel for schedule(static)
  for (int64_t z = 0; z < nz; ++z) {
    const double bz0 = a[0] * z + t[0];
    const double bz1 = a[3] * z + t[1];
    const double bz2 = a[6] * z + t[2];
    for (int64_t y = 0; y < ny; ++y) {
      const double by0 = bz0 + a[1] * y;
      const double by1 = bz1 + a[4] * y;
      const double by2 = bz2 + a[7] * y;
      float* orow = out + (z * ny + y) * nx;
      for (int64_t x = 0; x < nx; ++x) {
        const double sz = by0 + a[2] * x;
        const double sy = by1 + a[5] * x;
        const double sx = by2 + a[8] * x;
        const int64_t iz = (int64_t)std::floor(sz + 0.5);
        const int64_t iy = (int64_t)std::floor(sy + 0.5);
        const int64_t ix = (int64_t)std::floor(sx + 0.5);
        if (iz < 0 || iz >= nz || iy < 0 || iy >= ny || ix < 0 || ix >= nx) {
          orow[x] = cval;
        } else {
          orow[x] = in[(iz * ny + iy) * nx + ix];
        }
      }
    }
  }
}

// 2D variant.
void affine_nn_2d(const float* in, float* out, int64_t ny, int64_t nx,
                  const double* a /* 2x2 row-major */, const double* t,
                  float cval) {
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < ny; ++y) {
    const double by0 = a[0] * y + t[0];
    const double by1 = a[2] * y + t[1];
    float* orow = out + y * nx;
    for (int64_t x = 0; x < nx; ++x) {
      const double sy = by0 + a[1] * x;
      const double sx = by1 + a[3] * x;
      const int64_t iy = (int64_t)std::floor(sy + 0.5);
      const int64_t ix = (int64_t)std::floor(sx + 0.5);
      if (iy < 0 || iy >= ny || ix < 0 || ix >= nx) {
        orow[x] = cval;
      } else {
        orow[x] = in[iy * nx + ix];
      }
    }
  }
}

// Masked z-score normalization in place:
// statistics over elements != mask_val (if use_mask), masked refilled 0.
void zscore_masked(float* data, int64_t n, float mask_val, int use_mask) {
  double sum = 0.0, sumsq = 0.0;
  int64_t count = 0;
#pragma omp parallel for reduction(+ : sum, sumsq, count) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float v = data[i];
    if (!use_mask || v != mask_val) {
      sum += v;
      sumsq += (double)v * v;
      ++count;
    }
  }
  if (count == 0) {
    std::memset(data, 0, n * sizeof(float));
    return;
  }
  const double mean = sum / count;
  // population std (numpy default ddof=0), matching the reference
  const double var = sumsq / count - mean * mean;
  const double std = var > 0 ? std::sqrt(var) : 1.0;
  const float fmean = (float)mean, fstd = (float)std;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float v = data[i];
    if (use_mask && v == mask_val) {
      data[i] = 0.0f;
    } else {
      data[i] = (v - fmean) / fstd;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native NIfTI IO plane: zlib gunzip with a parallel batch entry point.
// The Python reader (data/nifti.py) parses headers; decompression is the
// hot part of file loading and gzread runs ~2-4x faster than Python's
// gzip module, with OpenMP fanning a batch across cores (the ctypes call
// releases the GIL for the whole batch).
// ---------------------------------------------------------------------------

#include <zlib.h>
#include <algorithm>

extern "C" {

// Decompress a .gz file into out (cap bytes). Returns bytes written,
// -1 on open/read error, -2 if the buffer is too small (e.g. multi-member
// gzip whose ISIZE trailer undercounts) — callers fall back to Python.
int64_t gunzip_file(const char* path, uint8_t* out, int64_t cap) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  gzbuffer(f, 1u << 20);
  int64_t total = 0;
  while (true) {
    const unsigned chunk = (unsigned)std::min<int64_t>(cap - total, 1 << 26);
    if (chunk == 0) {
      uint8_t probe;
      const int m = gzread(f, &probe, 1);
      gzclose(f);
      return m > 0 ? -2 : total;
    }
    const int n = gzread(f, out + total, chunk);
    if (n < 0) { gzclose(f); return -1; }
    if (n == 0) break;
    total += n;
  }
  gzclose(f);
  return total;
}

// Parallel batch decompress (one file per task).
void gunzip_batch(int32_t n, const char** paths, uint8_t** outs,
                  const int64_t* caps, int64_t* sizes) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t i = 0; i < n; ++i) {
    sizes[i] = gunzip_file(paths[i], outs[i], caps[i]);
  }
}

}  // extern "C"
