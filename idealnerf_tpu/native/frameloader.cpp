// Native threaded JPEG frame loader for idealnerf_tpu.
//
// Role: the framework's dataset design stages whole subjects into device
// HBM once (data/dataset.py); this loader is the ingest path — a
// work-stealing thread pool decoding JPEG frames (SIMD libjpeg-turbo)
// straight into one preallocated contiguous (N, H, W, 3) buffer, so a
// multi-thousand-frame subject loads at disk/codec speed instead of
// python-imageio speed. (The reference does per-step cv2.imread inside
// DataLoader workers — baseline.py:580, audio_exp_nerf.py:97.)
//
// C ABI (consumed via ctypes from data/native_loader.py):
//   fl_decode_batch(paths, n, out, h, w, n_threads) -> number decoded
//     paths: array of n C strings; out: n*h*w*3 bytes, caller-owned.
//     Frames whose size mismatches (h, w) or that fail to decode are
//     zero-filled and excluded from the return count.
//   fl_version() -> ABI version int.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit_throw(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);  // libjpeg default would exit() the process
}

bool decode_one(const char* path, unsigned char* dst, int H, int W) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_throw;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  if (static_cast<int>(cinfo.output_width) != W ||
      static_cast<int>(cinfo.output_height) != H ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = dst + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

int fl_version() { return 1; }

int fl_decode_batch(const char** paths, int n, unsigned char* out,
                    int h, int w, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  const size_t frame_bytes = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(0);
  std::atomic<int> ok(0);

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      unsigned char* dst = out + frame_bytes * i;
      if (decode_one(paths[i], dst, h, w)) {
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, frame_bytes);
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return ok.load();
}

}  // extern "C"
