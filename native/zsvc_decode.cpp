// zsvc_decode: threaded libjpeg batch decoder for the host input pipeline.
//
// TPU-native replacement for the reference's OpenCV/DataLoader-worker decode
// stage (/root/reference/auxiliary/auxiliary_dataset.py:211-266): the hot
// training path reads n_clips*clip_len JPEG frames per video. This library
// decodes a whole frame batch into one caller-provided RGB buffer with a
// pthread worker pool — no Python GIL, no per-frame numpy allocation, no
// BGR->RGB conversion pass (libjpeg emits RGB directly).
//
// Failure semantics mirror the reference: a frame that fails to decode
// repeats the previous decoded frame (auxiliary_dataset.py:253-258); if the
// first frame fails the batch is reported failed.
//
// Build: see native/Makefile (links against the system libjpeg).

#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG into dst (row-major RGB, h*w*3). Returns true on success
// and only if the decoded dimensions match (h, w). `denom` > 1 selects
// libjpeg's DCT-domain scaled decode (output = ceil(dim/denom), denom in
// {1,2,4,8}): the IDCT itself runs at the reduced size, so a 1/2 decode
// costs ~1/4 of the full IDCT work and emits 1/4 of the bytes — the host
// analog of "never move pixels the model will immediately throw away".
bool decode_one(const char* path, unsigned char* dst, int h, int w,
                int denom) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (denom > 1) {
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned int>(denom);
  }
  jpeg_start_decompress(&cinfo);

  bool ok = (static_cast<int>(cinfo.output_height) == h &&
             static_cast<int>(cinfo.output_width) == w &&
             cinfo.output_components == 3);
  if (ok) {
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = dst + static_cast<size_t>(cinfo.output_scanline) * w * 3;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return ok;
}

}  // namespace

extern "C" {

// Read just the header: -> 0 on success, fills (h, w) with the dimensions a
// decode at scale 1/denom would emit (libjpeg: ceil(dim/denom)); denom=1
// gives the encoded dimensions.
int zsvc_jpeg_dims_scaled(const char* path, int denom, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  if (denom > 1) {
    cinfo.scale_num = 1;
    cinfo.scale_denom = static_cast<unsigned int>(denom);
  }
  jpeg_calc_output_dimensions(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

int zsvc_jpeg_dims(const char* path, int* h, int* w) {
  return zsvc_jpeg_dims_scaled(path, 1, h, w);
}

// Decode n same-sized JPEGs into out [n, h, w, 3] with `threads` workers at
// DCT scale 1/denom ((h, w) are the SCALED output dims). Returns the number
// of successfully decoded frames; failed frames are filled from the previous
// decoded frame afterwards. Returns 0 if frame 0 failed.
int zsvc_decode_jpeg_batch_scaled(const char** paths, int n,
                                  unsigned char* out, int h, int w,
                                  int threads, int denom) {
  if (n <= 0) return 0;
  const size_t frame_bytes = static_cast<size_t>(h) * w * 3;
  std::vector<unsigned char> ok(n, 0);
  std::atomic<int> next(0);
  std::atomic<int> n_ok(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_one(paths[i], out + frame_bytes * i, h, w, denom)) {
        ok[i] = 1;
        n_ok.fetch_add(1);
      }
    }
  };

  int t = threads > 0 ? threads : 1;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  if (!ok[0]) return 0;
  for (int i = 1; i < n; ++i) {
    if (!ok[i]) {
      std::memcpy(out + frame_bytes * i, out + frame_bytes * (i - 1),
                  frame_bytes);
    }
  }
  return n_ok.load();
}

int zsvc_decode_jpeg_batch(const char** paths, int n, unsigned char* out,
                           int h, int w, int threads) {
  return zsvc_decode_jpeg_batch_scaled(paths, n, out, h, w, threads, 1);
}

}  // extern "C"
