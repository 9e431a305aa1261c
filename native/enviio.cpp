/* srcfinder_tpu native runtime: raster repacking + connected components.
 *
 * The reference leans on GDAL/spectral (C++) for raster access and on
 * scipy/skimage (C) for labeling (reference: srcfinder_util.py:392-395,
 * :1055-1073). This extension provides the framework's own native
 * equivalents for the host-side hot paths:
 *
 *  - bil_window_to_lcb: gather an active-band window from a BIL cube
 *    (lines, bands, samples) into the (lines, columns, bands) layout the
 *    device kernels consume, with dtype casting to float32, in one
 *    cache-blocked pass (replaces numpy strided fancy-slicing +
 *    transpose + astype, which materializes intermediates).
 *  - label8: two-pass union-find connected-component labeling with
 *    8-connectivity (the semantics of skimage.measure.label used across
 *    detection filtering).
 *
 * Python bindings use the raw CPython buffer protocol (no pybind11).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

template <typename T>
void repack(const char* src, float* dst, Py_ssize_t L, Py_ssize_t s_l,
            Py_ssize_t s_b, Py_ssize_t s_c, Py_ssize_t b0, Py_ssize_t b1,
            Py_ssize_t c0, Py_ssize_t c1) {
  const Py_ssize_t B = b1 - b0;
  const Py_ssize_t C = c1 - c0;
  // blocked over columns to keep the (band-major) source reads near
  // each other while writing band-contiguous destination rows
  const Py_ssize_t CB = 64;
  for (Py_ssize_t l = 0; l < L; ++l) {
    const char* srow = src + l * s_l;
    float* drow = dst + l * C * B;
    for (Py_ssize_t cc = 0; cc < C; cc += CB) {
      const Py_ssize_t ce = cc + CB < C ? cc + CB : C;
      for (Py_ssize_t b = 0; b < B; ++b) {
        const char* sband = srow + (b0 + b) * s_b;
        for (Py_ssize_t c = cc; c < ce; ++c) {
          const T v =
              *reinterpret_cast<const T*>(sband + (c0 + c) * s_c);
          drow[c * B + b] = static_cast<float>(v);
        }
      }
    }
  }
}

PyObject* bil_window_to_lcb(PyObject*, PyObject* args) {
  PyObject *src_obj, *dst_obj;
  Py_buffer src, dst;
  Py_ssize_t b0, b1, c0, c1;
  if (!PyArg_ParseTuple(args, "OOnnnn", &src_obj, &dst_obj, &b0, &b1, &c0,
                        &c1))
    return nullptr;
  if (PyObject_GetBuffer(src_obj, &src,
                         PyBUF_RECORDS_RO) < 0)
    return nullptr;
  if (PyObject_GetBuffer(dst_obj, &dst,
                         PyBUF_RECORDS | PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&src);
    return nullptr;
  }
  PyObject* result = nullptr;
  if (src.ndim != 3) {
    PyErr_SetString(PyExc_ValueError, "src must be 3-D (lines,bands,samples)");
  } else if (dst.ndim != 3 || std::strcmp(dst.format ? dst.format : "", "f")) {
    PyErr_SetString(PyExc_ValueError, "dst must be 3-D float32");
  } else if (b0 < 0 || b1 > src.shape[1] || c0 < 0 || c1 > src.shape[2] ||
             b1 <= b0 || c1 <= c0) {
    PyErr_SetString(PyExc_ValueError, "window out of range");
  } else if (dst.shape[0] != src.shape[0] || dst.shape[1] != c1 - c0 ||
             dst.shape[2] != b1 - b0) {
    PyErr_SetString(PyExc_ValueError, "dst shape mismatch");
  } else {
    const char* s = static_cast<const char*>(src.buf);
    float* d = static_cast<float*>(dst.buf);
    const Py_ssize_t L = src.shape[0];
    const Py_ssize_t sl = src.strides[0], sb = src.strides[1],
                     sc = src.strides[2];
    const char* fmt = src.format ? src.format : "";
    Py_BEGIN_ALLOW_THREADS
    if (!std::strcmp(fmt, "f"))
      repack<float>(s, d, L, sl, sb, sc, b0, b1, c0, c1);
    else if (!std::strcmp(fmt, "d"))
      repack<double>(s, d, L, sl, sb, sc, b0, b1, c0, c1);
    else if (!std::strcmp(fmt, "h"))
      repack<int16_t>(s, d, L, sl, sb, sc, b0, b1, c0, c1);
    else if (!std::strcmp(fmt, "H"))
      repack<uint16_t>(s, d, L, sl, sb, sc, b0, b1, c0, c1);
    else if (!std::strcmp(fmt, "i") || !std::strcmp(fmt, "l"))
      repack<int32_t>(s, d, L, sl, sb, sc, b0, b1, c0, c1);
    else
      fmt = nullptr;
    Py_END_ALLOW_THREADS
    if (!fmt)
      PyErr_SetString(PyExc_ValueError, "unsupported src dtype");
    else
      result = Py_NewRef(Py_None);
  }
  PyBuffer_Release(&src);
  PyBuffer_Release(&dst);
  return result;
}

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (b < a) std::swap(a, b);
    parent[b] = a;
  }
  int32_t add() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return parent.back();
  }
};

PyObject* label8(PyObject*, PyObject* args) {
  PyObject *mask_obj, *out_obj;
  Py_buffer mask, out;
  if (!PyArg_ParseTuple(args, "OO", &mask_obj, &out_obj)) return nullptr;
  if (PyObject_GetBuffer(mask_obj, &mask, PyBUF_RECORDS_RO) < 0)
    return nullptr;
  if (PyObject_GetBuffer(out_obj, &out,
                         PyBUF_RECORDS | PyBUF_C_CONTIGUOUS) < 0) {
    PyBuffer_Release(&mask);
    return nullptr;
  }
  PyObject* result = nullptr;
  if (mask.ndim != 2 ||
      std::strcmp(mask.format ? mask.format : "", "B") != 0) {
    PyErr_SetString(PyExc_ValueError, "mask must be 2-D uint8");
  } else if (out.ndim != 2 ||
             std::strcmp(out.format ? out.format : "", "i") != 0) {
    PyErr_SetString(PyExc_ValueError, "out must be 2-D int32");
  } else {
    const Py_ssize_t H = mask.shape[0], W = mask.shape[1];
    const Py_ssize_t ms0 = mask.strides[0], ms1 = mask.strides[1];
    const char* m = static_cast<const char*>(mask.buf);
    int32_t* lab = static_cast<int32_t*>(out.buf);
    int32_t nlab = 0;
    Py_BEGIN_ALLOW_THREADS {
      UnionFind uf;
      uf.parent.reserve(1024);
      auto at = [&](Py_ssize_t r, Py_ssize_t c) -> uint8_t {
        return *reinterpret_cast<const uint8_t*>(m + r * ms0 + c * ms1);
      };
      // first pass: provisional labels + merges (8-neighbors above/left)
      for (Py_ssize_t r = 0; r < H; ++r) {
        for (Py_ssize_t c = 0; c < W; ++c) {
          if (!at(r, c)) {
            lab[r * W + c] = -1;
            continue;
          }
          int32_t best = -1;
          const Py_ssize_t nr = r - 1;
          if (c > 0 && lab[r * W + c - 1] >= 0) best = lab[r * W + c - 1];
          if (nr >= 0) {
            for (Py_ssize_t dc = -1; dc <= 1; ++dc) {
              const Py_ssize_t nc = c + dc;
              if (nc < 0 || nc >= W) continue;
              const int32_t nl = lab[nr * W + nc];
              if (nl >= 0) {
                if (best < 0)
                  best = nl;
                else
                  uf.unite(best, nl);
              }
            }
          }
          if (best < 0) best = uf.add();
          lab[r * W + c] = best;
        }
      }
      // second pass: resolve + relabel sequentially
      std::vector<int32_t> remap(uf.parent.size(), 0);
      for (Py_ssize_t i = 0; i < H * W; ++i) {
        if (lab[i] < 0) {
          lab[i] = 0;
          continue;
        }
        const int32_t root = uf.find(lab[i]);
        if (!remap[root]) remap[root] = ++nlab;
        lab[i] = remap[root];
      }
    }
    Py_END_ALLOW_THREADS
    result = PyLong_FromLong(nlab);
  }
  PyBuffer_Release(&mask);
  PyBuffer_Release(&out);
  return result;
}

/* ---- TIFF 6.0 LZW (core/geotiff.py's hot codec) --------------------
 * Width-change rules calibrated against libtiff (PIL cross-checked by
 * tests/test_core_extras.py): the encoder bumps the code width when the
 * next free code reaches 2^bits and emits CLEAR at 4094; the decoder
 * bumps one entry earlier (its table lags the encoder's by one).
 */

constexpr int kClear = 256, kEoi = 257, kFirst = 258;

PyObject* lzw_encode(PyObject*, PyObject* args) {
  Py_buffer in;
  if (!PyArg_ParseTuple(args, "y*", &in)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(in.buf);
  const Py_ssize_t n = in.len;

  std::vector<uint8_t> out;
  out.reserve(static_cast<size_t>(n) / 2 + 64);
  uint64_t buf = 0;
  int nbuf = 0;
  auto emit = [&](uint32_t code, int bits) {
    buf = (buf << bits) | code;
    nbuf += bits;
    while (nbuf >= 8) {
      nbuf -= 8;
      out.push_back(static_cast<uint8_t>((buf >> nbuf) & 0xFF));
    }
    buf &= (1ull << nbuf) - 1;
  };

  Py_BEGIN_ALLOW_THREADS
  std::vector<int32_t> tab(4096 * 256, -1);
  int nxt = kFirst, bits = 9;
  emit(kClear, bits);
  if (n > 0) {
    int cur = data[0];
    for (Py_ssize_t i = 1; i < n; ++i) {
      const uint8_t b = data[i];
      int32_t& slot = tab[static_cast<size_t>(cur) * 256 + b];
      if (slot >= 0) {
        cur = slot;
        continue;
      }
      emit(static_cast<uint32_t>(cur), bits);
      slot = nxt++;
      if (nxt == 4094) {  // table nearly full: restart
        emit(kClear, bits);
        std::fill(tab.begin(), tab.end(), -1);
        nxt = kFirst;
        bits = 9;
      } else if (nxt == (1 << bits) && bits < 12) {
        ++bits;
      }
      cur = b;
    }
    emit(static_cast<uint32_t>(cur), bits);
  }
  emit(kEoi, bits);
  if (nbuf) out.push_back(static_cast<uint8_t>((buf << (8 - nbuf)) & 0xFF));
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&in);
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size()));
}

PyObject* lzw_decode(PyObject*, PyObject* args) {
  Py_buffer in;
  if (!PyArg_ParseTuple(args, "y*", &in)) return nullptr;
  const uint8_t* data = static_cast<const uint8_t*>(in.buf);
  const Py_ssize_t n = in.len;

  std::vector<uint8_t> out;
  out.reserve(static_cast<size_t>(n) * 3 + 64);
  bool corrupt = false;
  int bad_code = -1;

  Py_BEGIN_ALLOW_THREADS
  std::vector<int32_t> prefix(4096, -1);
  std::vector<uint8_t> last(4096), first(4096);
  std::vector<int32_t> length(4096, 0);
  for (int i = 0; i < 256; ++i) {
    last[i] = first[i] = static_cast<uint8_t>(i);
    length[i] = 1;
  }
  int nextcode = kFirst, bits = 9, prev = -1;
  uint64_t buf = 0;
  int nbuf = 0;
  Py_ssize_t pos = 0;

  auto emit_code = [&](int code) {
    const size_t start = out.size();
    out.resize(start + static_cast<size_t>(length[code]));
    int c = code;
    for (Py_ssize_t k = length[code] - 1; k >= 0; --k) {
      out[start + k] = last[c];
      c = prefix[c];
    }
  };

  for (;;) {
    while (nbuf < bits) {
      if (pos >= n) goto done;
      buf = (buf << 8) | data[pos++];
      nbuf += 8;
    }
    nbuf -= bits;
    const int code = static_cast<int>((buf >> nbuf) & ((1u << bits) - 1));
    buf &= (1ull << nbuf) - 1;

    if (code == kEoi) break;
    if (code == kClear) {
      nextcode = kFirst;
      bits = 9;
      prev = -1;
      continue;
    }
    if (prev < 0) {
      if (code > 255) {
        corrupt = true;
        bad_code = code;
        goto done;
      }
      emit_code(code);
    } else if (code < nextcode) {
      if (nextcode < 4096) {
        prefix[nextcode] = prev;
        last[nextcode] = first[code];
        first[nextcode] = first[prev];
        length[nextcode] = length[prev] + 1;
        ++nextcode;
      }
      emit_code(code);
      if (nextcode == (1 << bits) - 1 && bits < 12) ++bits;
    } else if (code == nextcode && nextcode < 4096) {
      prefix[nextcode] = prev;
      last[nextcode] = first[prev];
      first[nextcode] = first[prev];
      length[nextcode] = length[prev] + 1;
      ++nextcode;
      emit_code(code);
      if (nextcode == (1 << bits) - 1 && bits < 12) ++bits;
    } else {
      corrupt = true;
      bad_code = code;
      goto done;
    }
    prev = code;
  }
done:;
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&in);
  if (corrupt) {
    PyErr_Format(PyExc_ValueError, "corrupt LZW stream (code %d)",
                 bad_code);
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size()));
}

PyMethodDef methods[] = {
    {"bil_window_to_lcb", bil_window_to_lcb, METH_VARARGS,
     "Repack a BIL (L,B,C) band/column window into float32 (L,C,B)."},
    {"label8", label8, METH_VARARGS,
     "8-connected component labeling of a uint8 mask into int32 labels; "
     "returns the number of labels."},
    {"lzw_encode", lzw_encode, METH_VARARGS,
     "TIFF 6.0 LZW compression of a bytes-like object."},
    {"lzw_decode", lzw_decode, METH_VARARGS,
     "TIFF 6.0 LZW decompression of a bytes-like object."},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native",
                         "srcfinder_tpu native runtime", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moduledef); }
