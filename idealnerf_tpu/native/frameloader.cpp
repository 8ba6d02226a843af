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
//   Streaming ring (datasets larger than HBM/host RAM): a background
//   pool decodes chunk k+1 into the idle half of a double buffer while
//   the consumer stages chunk k to the device —
//   fl_stream_open(paths, n, h, w, chunk, n_threads) -> handle (or 0)
//   fl_stream_next(handle, &buf, &n_frames) -> chunk index (or -1 when
//     exhausted); blocks until the next chunk is decoded, hands out its
//     buffer, and immediately starts prefetching the following chunk.
//     The buffer stays valid until the NEXT fl_stream_next call.
//   fl_stream_close(handle)
//   fl_version() -> ABI version int.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
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

int fl_version() { return 2; }  // 2: + streaming ring ABI

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

// ------------------------------------------------------------ streaming

namespace {

void decode_range(const std::vector<std::string>& paths, int begin, int end,
                  unsigned char* out, int h, int w, int n_threads) {
  const size_t frame_bytes = static_cast<size_t>(h) * w * 3;
  std::atomic<int> next(begin);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= end) return;
      unsigned char* dst = out + frame_bytes * (i - begin);
      if (!decode_one(paths[i].c_str(), dst, h, w)) {
        std::memset(dst, 0, frame_bytes);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
}

struct Stream {
  std::vector<std::string> paths;
  int h, w, chunk, n_threads;
  std::vector<unsigned char> buf[2];  // the double buffer
  int produced = 0;      // chunks fully decoded by the producer
  int consumed = 0;      // chunks handed to the consumer
  int n_chunks = 0;
  bool closing = false;
  std::mutex mu;
  std::condition_variable cv;
  std::thread producer;

  void run() {
    for (int c = 0; c < n_chunks; ++c) {
      {
        // chunk c reuses chunk c-2's buffer half. The consumer uses
        // chunk k's buffer until it TAKES chunk k+1 (consumed = k+2
        // releases it), so chunk c-2 is free once consumed >= c; the
        // first two chunks have fresh halves and never wait.
        std::unique_lock<std::mutex> lock(mu);
        cv.wait(lock, [&] { return closing || c < 2 || consumed >= c; });
        if (closing) return;
      }
      const int begin = c * chunk;
      const int end = begin + std::min<int>(chunk, (int)paths.size() - begin);
      decode_range(paths, begin, end, buf[c & 1].data(), h, w, n_threads);
      {
        std::lock_guard<std::mutex> lock(mu);
        produced = c + 1;
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* fl_stream_open(const char** paths, int n, int h, int w, int chunk,
                     int n_threads) {
  if (n <= 0 || chunk <= 0) return nullptr;
  auto* s = new Stream();
  s->paths.assign(paths, paths + n);
  s->h = h;
  s->w = w;
  s->chunk = chunk;
  s->n_threads = n_threads < 1 ? 1 : n_threads;
  s->n_chunks = (n + chunk - 1) / chunk;
  const size_t cap = static_cast<size_t>(chunk) * h * w * 3;
  s->buf[0].resize(cap);
  s->buf[1].resize(cap);
  s->producer = std::thread([s] { s->run(); });
  return s;
}

int fl_stream_next(void* handle, unsigned char** buf_out, int* n_frames) {
  auto* s = static_cast<Stream*>(handle);
  if (s == nullptr || s->consumed >= s->n_chunks) return -1;
  const int c = s->consumed;
  {
    std::unique_lock<std::mutex> lock(s->mu);
    s->cv.wait(lock, [&] { return s->produced > c; });
    s->consumed = c + 1;  // frees the other half for the producer
  }
  s->cv.notify_all();
  *buf_out = s->buf[c & 1].data();
  *n_frames = std::min<int>(s->chunk, (int)s->paths.size() - c * s->chunk);
  return c;
}

void fl_stream_close(void* handle) {
  auto* s = static_cast<Stream*>(handle);
  if (s == nullptr) return;
  {
    std::lock_guard<std::mutex> lock(s->mu);
    s->closing = true;
    s->consumed = s->n_chunks;  // release any producer wait
  }
  s->cv.notify_all();
  if (s->producer.joinable()) s->producer.join();
  delete s;
}

}  // extern "C"
