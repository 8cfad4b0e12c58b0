// hupr_tpu native data loader.
//
// Role: the reference feeds training through torch DataLoader worker
// *processes* whose Python __getitem__ does np.load + per-chirp transforms
// (reference datasets/dataset.py:120-159). Here the hot host-side path —
// read .npy radar frames, slice the center chirps, split complex into
// float32 real/imag planes — is a threaded C++ library driven via ctypes,
// so batch assembly never touches the GIL and overlaps file IO with
// conversion.
//
// .npy layout handled: v1.0/v2.0 headers, dtypes '<c8' (complex64) and
// '<c16' (complex128), C-order, shape (chirps, R, A, E).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libhupr_loader.so npy_loader.cc -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  long data_offset = 0;
  int item_bytes = 0;     // 8 for c8, 16 for c16
  long n_items = 0;
  long shape[8];
  int ndim = 0;
  bool ok = false;
};

// Minimal .npy header parser (spec: numpy/lib/format.py).
NpyInfo parse_npy_header(FILE* f) {
  NpyInfo info;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return info;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return info;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    if (fread(&len16, 2, 1, f) != 1) return info;
    header_len = len16;
    info.data_offset = 10 + header_len;
  } else {
    if (fread(&header_len, 4, 1, f) != 1) return info;
    info.data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return info;

  if (header.find("'fortran_order': True") != std::string::npos) return info;
  if (header.find("<c8") != std::string::npos) {
    info.item_bytes = 8;
  } else if (header.find("<c16") != std::string::npos) {
    info.item_bytes = 16;
  } else {
    return info;
  }

  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return info;
  size_t open = header.find('(', sp);
  size_t close = header.find(')', open);
  if (open == std::string::npos || close == std::string::npos) return info;
  std::string dims = header.substr(open + 1, close - open - 1);
  long n_items = 1;
  const char* p = dims.c_str();
  while (*p && info.ndim < 8) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    long d = strtol(p, const_cast<char**>(&p), 10);
    info.shape[info.ndim++] = d;
    n_items *= d;
  }
  info.n_items = n_items;
  info.ok = info.ndim >= 1;
  return info;
}

// Load one frame file: slice chirps [c0, c0+cn) of a (chirps, R, A, E)
// complex array into float32 re/im planes of cn*inner elements each.
bool load_one(const char* path, long c0, long cn, long inner,
              float* out_re, float* out_im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  NpyInfo info = parse_npy_header(f);
  if (!info.ok || info.ndim < 2) { fclose(f); return false; }
  long file_inner = 1;
  for (int i = 1; i < info.ndim; i++) file_inner *= info.shape[i];
  // c0 < 0 would fseek into the header and return its bytes as samples
  if (file_inner != inner || c0 < 0 || cn < 0 || c0 + cn > info.shape[0]) {
    fclose(f);
    return false;
  }

  long n = cn * inner;
  if (fseek(f, info.data_offset + c0 * inner * info.item_bytes, SEEK_SET)) {
    fclose(f);
    return false;
  }
  if (info.item_bytes == 8) {
    std::vector<float> buf(n * 2);
    if (fread(buf.data(), 8, n, f) != (size_t)n) { fclose(f); return false; }
    for (long i = 0; i < n; i++) {
      out_re[i] = buf[2 * i];
      out_im[i] = buf[2 * i + 1];
    }
  } else {
    std::vector<double> buf(n * 2);
    if (fread(buf.data(), 16, n, f) != (size_t)n) { fclose(f); return false; }
    for (long i = 0; i < n; i++) {
      out_re[i] = (float)buf[2 * i];
      out_im[i] = (float)buf[2 * i + 1];
    }
  }
  fclose(f);
  return true;
}

}  // namespace

extern "C" {

// paths: n null-terminated strings. Output planes: (n, cn, inner) float32.
// Returns the number of successfully loaded frames (== n on full success).
int hupr_load_frames(const char** paths, int n, long c0, long cn, long inner,
                     float* out_re, float* out_im, int n_threads) {
  std::atomic<int> next(0), loaded(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      long off = (long)i * cn * inner;
      if (load_one(paths[i], c0, cn, inner, out_re + off, out_im + off)) {
        loaded.fetch_add(1);
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads && t < n; t++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return loaded.load();
}

// Probe a file: returns 0 on parse failure, else item size in bytes.
int hupr_probe_npy(const char* path, long* shape_out, int* ndim_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  NpyInfo info = parse_npy_header(f);
  fclose(f);
  if (!info.ok) return 0;
  for (int i = 0; i < info.ndim; i++) shape_out[i] = info.shape[i];
  *ndim_out = info.ndim;
  return info.item_bytes;
}

}  // extern "C"
