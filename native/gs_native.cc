// gs_native: host-side native runtime for gaussian_splatting_tpu.
//
// TPU-native re-hosting of the reference's two C++/CUDA host components:
//   - submodules/simple-knn (simple_knn.cu:45-213): Morton-sorted
//     approximate 3-nearest-neighbor mean squared distance used once to
//     initialize per-Gaussian log-scales (gaussian_model.py:202-210).
//     Here it runs multithreaded on the host CPU (the TPU path is the
//     jnp Morton implementation in ops/knn.py; this one is exact-window
//     and faster for multi-million-point COLMAP clouds).
//   - the COLMAP points3D.bin parse loop (scene/colmap_loader.py:125-145):
//     variable-length track records force a per-point Python loop; this
//     reads the whole file in one pass.
//
// CPython C API + NumPy only (no pybind11 in this environment).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// points3D.bin reader
// ---------------------------------------------------------------------

static PyObject* read_points3d_bin(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  // Read the whole file (typically tens to hundreds of MB).
  fseek(f, 0, SEEK_END);
  const long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(fsize));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    PyErr_Format(PyExc_IOError, "short read on %s", path);
    return nullptr;
  }
  fclose(f);

  const uint8_t* p = buf.data();
  const uint8_t* end = p + buf.size();
  if (end - p < 8) {
    PyErr_SetString(PyExc_ValueError, "truncated points3D.bin");
    return nullptr;
  }
  uint64_t num;
  memcpy(&num, p, 8);
  p += 8;
  // The count is untrusted input: each record is >= 51 bytes, so a claimed
  // count the file cannot possibly hold is rejected before allocating.
  if (num > static_cast<uint64_t>(end - p) / 51) {
    PyErr_SetString(PyExc_ValueError, "points3D.bin count exceeds file size");
    return nullptr;
  }

  npy_intp dims_xyz[2] = {static_cast<npy_intp>(num), 3};
  npy_intp dims_n[1] = {static_cast<npy_intp>(num)};
  PyObject* xyz = PyArray_SimpleNew(2, dims_xyz, NPY_FLOAT64);
  PyObject* rgb = PyArray_SimpleNew(2, dims_xyz, NPY_UINT8);
  PyObject* err = PyArray_SimpleNew(1, dims_n, NPY_FLOAT64);
  if (!xyz || !rgb || !err) {
    Py_XDECREF(xyz);
    Py_XDECREF(rgb);
    Py_XDECREF(err);
    return nullptr;
  }
  double* xyz_d = static_cast<double*>(PyArray_DATA((PyArrayObject*)xyz));
  uint8_t* rgb_d = static_cast<uint8_t*>(PyArray_DATA((PyArrayObject*)rgb));
  double* err_d = static_cast<double*>(PyArray_DATA((PyArrayObject*)err));
  auto fail = [&](const char* msg) -> PyObject* {
    Py_DECREF(xyz);
    Py_DECREF(rgb);
    Py_DECREF(err);
    PyErr_SetString(PyExc_ValueError, msg);
    return nullptr;
  };

  for (uint64_t i = 0; i < num; ++i) {
    // i64 id, f64 xyz[3], u8 rgb[3], f64 error, u64 track_len, track...
    if (end - p < 51) {
      return fail("truncated points3D.bin record");
    }
    p += 8;  // point id (unused; row index is the identity used downstream)
    memcpy(xyz_d + 3 * i, p, 24);
    p += 24;
    memcpy(rgb_d + 3 * i, p, 3);
    p += 3;
    memcpy(err_d + i, p, 8);
    p += 8;
    uint64_t tlen;
    memcpy(&tlen, p, 8);
    p += 8;
    // Validate the untrusted track length BEFORE the pointer advance —
    // a corrupt value must not overflow the arithmetic.
    if (tlen > static_cast<uint64_t>(end - p) / 8) {
      return fail("truncated points3D.bin track");
    }
    p += 8 * tlen;  // skip (i32 image_id, i32 point2D_idx) pairs
  }
  return Py_BuildValue("(NNN)", xyz, rgb, err);
}

// ---------------------------------------------------------------------
// Morton 3-NN mean squared distance (simple-knn behavioral equivalent)
// ---------------------------------------------------------------------

static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

struct KBest3 {
  float d[3] = {INFINITY, INFINITY, INFINITY};
  inline void add(float v) {
    if (v < d[2]) {
      d[2] = v;
      if (d[2] < d[1]) std::swap(d[1], d[2]);
      if (d[1] < d[0]) std::swap(d[0], d[1]);
    }
  }
  inline float mean() const {
    float s = 0;
    int n = 0;
    for (float v : d)
      if (std::isfinite(v)) {
        s += v;
        ++n;
      }
    return n ? s / n : 0.f;
  }
};

static PyObject* mean_knn_dist2(PyObject*, PyObject* args) {
  PyObject* pts_obj = nullptr;
  int window = 32;
  if (!PyArg_ParseTuple(args, "O|i", &pts_obj, &window)) return nullptr;

  PyArrayObject* pts = (PyArrayObject*)PyArray_FROM_OTF(
      pts_obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED);
  if (!pts) return nullptr;
  if (PyArray_NDIM(pts) != 2 || PyArray_DIM(pts, 1) != 3) {
    Py_DECREF(pts);
    PyErr_SetString(PyExc_ValueError, "points must be (N, 3)");
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(pts, 0);
  const float* xyz = static_cast<const float*>(PyArray_DATA(pts));

  npy_intp dims[1] = {n};
  PyObject* out_obj = PyArray_SimpleNew(1, dims, NPY_FLOAT32);
  float* out = static_cast<float*>(PyArray_DATA((PyArrayObject*)out_obj));

  Py_BEGIN_ALLOW_THREADS;
  // bounding box
  float lo[3] = {INFINITY, INFINITY, INFINITY};
  float hi[3] = {-INFINITY, -INFINITY, -INFINITY};
  for (npy_intp i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c) {
      lo[c] = std::min(lo[c], xyz[3 * i + c]);
      hi[c] = std::max(hi[c], xyz[3 * i + c]);
    }
  float inv[3];
  for (int c = 0; c < 3; ++c) {
    float ext = hi[c] - lo[c];
    inv[c] = ext > 0 ? 1023.f / ext : 0.f;
  }

  // Morton order (simple_knn.cu:45-70)
  std::vector<std::pair<uint32_t, uint32_t>> order(n);
  for (npy_intp i = 0; i < n; ++i) {
    uint32_t m = 0;
    uint32_t g[3];
    for (int c = 0; c < 3; ++c)
      g[c] = static_cast<uint32_t>(
          std::min(1023.f, std::max(0.f, (xyz[3 * i + c] - lo[c]) * inv[c])));
    m = (expand_bits(g[0]) << 2) | (expand_bits(g[1]) << 1) | expand_bits(g[2]);
    order[i] = {m, static_cast<uint32_t>(i)};
  }
  std::sort(order.begin(), order.end());

  std::vector<float> sorted(3 * n);
  for (npy_intp i = 0; i < n; ++i)
    memcpy(&sorted[3 * i], &xyz[3 * order[i].second], 12);

  // +-window sweep in Morton order, multithreaded over points
  const int nthreads =
      std::max(1u, std::min(std::thread::hardware_concurrency(), 16u));
  std::vector<std::thread> threads;
  auto work = [&](npy_intp beg, npy_intp endi) {
    for (npy_intp i = beg; i < endi; ++i) {
      KBest3 kb;
      const float* a = &sorted[3 * i];
      const npy_intp j0 = std::max<npy_intp>(0, i - window);
      const npy_intp j1 = std::min<npy_intp>(n, i + window + 1);
      for (npy_intp j = j0; j < j1; ++j) {
        if (j == i) continue;
        const float* b = &sorted[3 * j];
        const float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
        kb.add(dx * dx + dy * dy + dz * dz);
      }
      out[order[i].second] = kb.mean();
    }
  };
  const npy_intp per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    npy_intp beg = t * per;
    if (beg >= n) break;
    threads.emplace_back(work, beg, std::min<npy_intp>(n, beg + per));
  }
  for (auto& t : threads) t.join();
  Py_END_ALLOW_THREADS;

  Py_DECREF(pts);
  return out_obj;
}

static PyMethodDef methods[] = {
    {"read_points3d_bin", read_points3d_bin, METH_VARARGS,
     "Parse COLMAP points3D.bin -> (xyz (N,3) f64, rgb (N,3) u8, err (N,) f64)."},
    {"mean_knn_dist2", mean_knn_dist2, METH_VARARGS,
     "Mean squared distance to the 3 nearest neighbors (Morton window), "
     "(N,3) f32 -> (N,) f32."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "gs_native",
    "Native host runtime for gaussian_splatting_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_gs_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
