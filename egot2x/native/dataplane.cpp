// egot2x native data plane: threaded JPEG decode + crop/resize/normalize.
//
// Replaces the per-item Python cv2 loops in the reference's data loaders
// (HHI/dataset/lam/data_loader.py:196-241 and friends) with one batched
// C++ call: a worker pool decodes JPEG files, crops the face bbox,
// bilinearly resizes to the target square, and optionally writes
// mean/std-normalized float32 — the host-side hot loop of the
// BASELINE.json "pipelined" requirement.
//
// C ABI (ctypes):
//   int decode_crop_resize_batch(const char** paths, const float* bboxes,
//                                int n, int out_size, unsigned char* out,
//                                int n_threads);
//     bboxes: n x 4 floats (x1, y1, x2, y2); negative x1 => full image.
//     out: n * out_size * out_size * 3 bytes (RGB). Returns #decoded.
//   void normalize_batch(const unsigned char* in, float* out, long n,
//                        const float* mean, const float* std, int n_threads);
//     in: n*3 interleaved RGB bytes -> out floats ((v/255)-mean)/std.

#include <atomic>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file to an RGB buffer. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<unsigned char>& buf, int& w,
                 int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  buf.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = buf.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize of an RGB crop [x1,x2) x [y1,y2) to out_size^2
// (cv2.resize INTER_LINEAR semantics: src = (dst + 0.5) * scale - 0.5).
void crop_resize(const unsigned char* src, int w, int h, float x1, float y1,
                 float x2, float y2, int out_size, unsigned char* dst) {
  int cx1 = std::max(0, static_cast<int>(x1));
  int cy1 = std::max(0, static_cast<int>(y1));
  int cx2 = std::min(w, static_cast<int>(x2));
  int cy2 = std::min(h, static_cast<int>(y2));
  int cw = cx2 - cx1, ch = cy2 - cy1;
  if (cw <= 0 || ch <= 0) {
    std::memset(dst, 0, static_cast<size_t>(out_size) * out_size * 3);
    return;
  }
  const float sx = static_cast<float>(cw) / out_size;
  const float sy = static_cast<float>(ch) / out_size;
  // Precompute per-column source indices and fixed-point weights
  // (11-bit, cv2-style) so the inner loop is integer-only.
  std::vector<int> x0s(out_size), x1s(out_size);
  std::vector<int> wxs(out_size);
  constexpr int SHIFT = 11, ONE = 1 << SHIFT;
  for (int ox = 0; ox < out_size; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    int x0 = static_cast<int>(fx);
    x0s[ox] = x0 * 3;
    x1s[ox] = std::min(x0 + 1, cw - 1) * 3;
    wxs[ox] = static_cast<int>((fx - x0) * ONE + 0.5f);
  }
  // Horizontal pass into two row buffers, then vertical blend.
  std::vector<int> hbuf0(out_size * 3), hbuf1(out_size * 3);
  int cached_y0 = -2, cached_y1 = -2;
  auto hresize = [&](int sy_row, std::vector<int>& hbuf) {
    const unsigned char* row = src + (static_cast<size_t>(cy1 + sy_row) * w + cx1) * 3;
    for (int ox = 0; ox < out_size; ++ox) {
      const unsigned char* p0 = row + x0s[ox];
      const unsigned char* p1 = row + x1s[ox];
      int wx = wxs[ox];
      int* o = hbuf.data() + ox * 3;
      o[0] = p0[0] * (ONE - wx) + p1[0] * wx;
      o[1] = p0[1] * (ONE - wx) + p1[1] * wx;
      o[2] = p0[2] * (ONE - wx) + p1[2] * wx;
    }
  };
  for (int oy = 0; oy < out_size; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1i = std::min(y0 + 1, ch - 1);
    int wy = static_cast<int>((fy - y0) * ONE + 0.5f);
    if (y0 != cached_y0) {
      if (y0 == cached_y1) {
        std::swap(hbuf0, hbuf1);
        cached_y0 = y0;
        cached_y1 = -2;
      } else {
        hresize(y0, hbuf0);
        cached_y0 = y0;
      }
    }
    if (y1i != cached_y1) {
      hresize(y1i, hbuf1);
      cached_y1 = y1i;
    }
    unsigned char* orow = dst + static_cast<size_t>(oy) * out_size * 3;
    const long half = 1L << (2 * SHIFT);  // rounding at 2*SHIFT scale / 2
    for (int i = 0; i < out_size * 3; ++i) {
      long v = static_cast<long>(hbuf0[i]) * (ONE - wy) +
               static_cast<long>(hbuf1[i]) * wy;
      orow[i] = static_cast<unsigned char>((v + half / 2) >> (2 * SHIFT));
    }
  }
}

}  // namespace

extern "C" {

int decode_crop_resize_batch(const char** paths, const float* bboxes, int n,
                             int out_size, unsigned char* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0), ok(0);
  const size_t item = static_cast<size_t>(out_size) * out_size * 3;
  auto worker = [&]() {
    std::vector<unsigned char> buf;
    int w, h;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      unsigned char* dst = out + item * i;
      if (!decode_jpeg(paths[i], buf, w, h)) {
        std::memset(dst, 0, item);
        continue;
      }
      const float* bb = bboxes + 4 * i;
      float x1 = bb[0], y1 = bb[1], x2 = bb[2], y2 = bb[3];
      if (x1 < 0) {  // full frame
        x1 = 0; y1 = 0; x2 = static_cast<float>(w); y2 = static_cast<float>(h);
      }
      crop_resize(buf.data(), w, h, x1, y1, x2, y2, out_size, dst);
      ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(n_threads, n > 0 ? n : 1);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

void normalize_batch(const unsigned char* in, float* out, long n_pixels,
                     const float* mean, const float* std_, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  long chunk = (n_pixels + n_threads - 1) / n_threads;
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    long start = t * chunk;
    long end = std::min(n_pixels, start + chunk);
    if (start >= end) break;
    threads.emplace_back([=]() {
      for (long p = start; p < end; ++p) {
        const unsigned char* px = in + p * 3;
        float* o = out + p * 3;
        for (int c = 0; c < 3; ++c)
          o[c] = (px[c] * inv255 - mean[c]) * inv_std[c];
      }
    });
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
