// framestore: threaded host-side video decode + staging service.
//
// The TPU cannot decode H.264; the host must deliver contiguous
// (T, H, Wpad, 3) uint8 chunks fast enough to keep the chip busy (the
// reference decodes synchronously inside its compute loop,
// rppg_VIDEO.py:356).  This service decodes on a background thread into a
// bounded ring of pre-allocated staging buffers, so decode overlaps with
// device compute, and optionally row-pads frames to a 128-lane multiple for
// the Pallas ROI kernel's DMA alignment.
//
// C ABI (consumed from Python via ctypes — no pybind11 in this image):
//   vhr_open(path, chunk_frames, pad_row_to)  -> handle (>0) or 0
//   vhr_meta(handle, out[5])                  -> width,height,fps,count,ok
//   vhr_next_chunk(handle, buf, buf_bytes)    -> frames filled (0 = EOF)
//   vhr_close(handle)
//   vhr_writer_open(path, w, h, fps, fourcc)  -> handle
//   vhr_writer_put(handle, buf, n)            -> n written
//   vhr_writer_close(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct Chunk {
  std::vector<uint8_t> data;  // (n, H, Wpad*3)
  int n = 0;
};

struct Reader {
  cv::VideoCapture cap;
  int width = 0, height = 0, row_bytes = 0, pad_row_bytes = 0;
  double fps = 0.0;
  int frame_count = 0;
  int chunk_frames = 0;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::deque<std::unique_ptr<Chunk>> ready;
  size_t max_ready = 3;  // bounded staging ring
  bool eof = false, stop = false;
  // Occupancy statistics (under mu): how often each side of the pipeline
  // stalled on the other — consumer_blocked > 0 means decode is the
  // bottleneck; producer_blocked > 0 means device compute is.
  long produced = 0, consumed = 0;
  long producer_blocked = 0, consumer_blocked = 0;

  ~Reader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_full.notify_all();
    cv_empty.notify_all();
    if (worker.joinable()) worker.join();
  }

  void run() {
    cv::Mat frame;
    while (true) {
      auto chunk = std::make_unique<Chunk>();
      chunk->data.resize(static_cast<size_t>(chunk_frames) * height *
                         pad_row_bytes);
      int n = 0;
      while (n < chunk_frames) {
        if (!cap.read(frame)) break;
        uint8_t* dst =
            chunk->data.data() + static_cast<size_t>(n) * height * pad_row_bytes;
        for (int y = 0; y < height; ++y) {
          std::memcpy(dst + static_cast<size_t>(y) * pad_row_bytes,
                      frame.ptr(y), row_bytes);
          if (pad_row_bytes > row_bytes)
            std::memset(dst + static_cast<size_t>(y) * pad_row_bytes + row_bytes,
                        0, pad_row_bytes - row_bytes);
        }
        ++n;
      }
      chunk->n = n;
      bool at_eof = n < chunk_frames;
      {
        std::unique_lock<std::mutex> lk(mu);
        if (ready.size() >= max_ready && !stop) ++producer_blocked;
        cv_full.wait(lk, [&] { return ready.size() < max_ready || stop; });
        if (stop) return;
        if (n > 0) {
          ready.push_back(std::move(chunk));
          ++produced;
        }
        if (at_eof) {
          eof = true;
          cv_empty.notify_all();
          return;
        }
      }
      cv_empty.notify_all();
    }
  }
};

struct Writer {
  cv::VideoWriter out;
  int width = 0, height = 0;
};

std::mutex g_mu;
// shared_ptr handles: calls copy the pointer out under g_mu, so a concurrent
// vhr_close/vhr_writer_close only removes the map entry and destruction
// defers until the in-flight call drops its reference (no use-after-free).
std::unordered_map<int64_t, std::shared_ptr<Reader>> g_readers;
std::unordered_map<int64_t, std::shared_ptr<Writer>> g_writers;
std::atomic<int64_t> g_next{1};

template <typename T>
std::shared_ptr<T> lookup(std::unordered_map<int64_t, std::shared_ptr<T>>& m,
                          int64_t handle) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = m.find(handle);
  return it == m.end() ? nullptr : it->second;
}

}  // namespace

extern "C" {

int64_t vhr_open(const char* path, int chunk_frames, int pad_row_to) {
  auto r = std::make_shared<Reader>();
  if (!r->cap.open(path)) return 0;
  r->width = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_WIDTH));
  r->height = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_HEIGHT));
  r->fps = r->cap.get(cv::CAP_PROP_FPS);
  r->frame_count = static_cast<int>(r->cap.get(cv::CAP_PROP_FRAME_COUNT));
  r->chunk_frames = chunk_frames > 0 ? chunk_frames : 256;
  r->row_bytes = r->width * 3;
  r->pad_row_bytes = r->row_bytes;
  if (pad_row_to > 1) {
    // Pad rows to a multiple of both pad_row_to (DMA lane alignment) and 3
    // (whole BGR pixels), so chunks reshape to (n, H, W_pad, 3) exactly.
    int64_t L = pad_row_to;
    while (L % 3) L += pad_row_to;
    int64_t rem = r->row_bytes % L;
    if (rem) r->pad_row_bytes = r->row_bytes + static_cast<int>(L - rem);
  }
  Reader* raw = r.get();
  raw->worker = std::thread([raw] { raw->run(); });
  int64_t h = g_next.fetch_add(1);
  std::lock_guard<std::mutex> lk(g_mu);
  g_readers[h] = std::move(r);
  return h;
}

int vhr_meta(int64_t handle, double* out5) {
  auto r = lookup(g_readers, handle);
  if (!r) return 0;
  out5[0] = r->width;
  out5[1] = r->height;
  out5[2] = r->fps;
  out5[3] = r->frame_count;
  out5[4] = r->pad_row_bytes / 3.0;  // padded width in pixels
  return 1;
}

// Blocks until a chunk is ready (or EOF).  Returns frames copied.
int vhr_next_chunk(int64_t handle, uint8_t* buf, int64_t buf_bytes) {
  auto r = lookup(g_readers, handle);
  if (!r) return -1;
  std::unique_ptr<Chunk> chunk;
  {
    std::unique_lock<std::mutex> lk(r->mu);
    if (r->ready.empty() && !r->eof && !r->stop) ++r->consumer_blocked;
    r->cv_empty.wait(lk, [&] { return !r->ready.empty() || r->eof || r->stop; });
    if (r->ready.empty()) return 0;  // EOF
    chunk = std::move(r->ready.front());
    r->ready.pop_front();
    ++r->consumed;
  }
  r->cv_full.notify_all();
  int64_t need = static_cast<int64_t>(chunk->n) * r->height * r->pad_row_bytes;
  if (need > buf_bytes) return -2;
  std::memcpy(buf, chunk->data.data(), need);
  return chunk->n;
}

// Staging-ring stats: produced, consumed, producer_blocked, consumer_blocked.
int vhr_stats(int64_t handle, double* out4) {
  auto r = lookup(g_readers, handle);
  if (!r) return 0;
  std::lock_guard<std::mutex> lk(r->mu);
  out4[0] = static_cast<double>(r->produced);
  out4[1] = static_cast<double>(r->consumed);
  out4[2] = static_cast<double>(r->producer_blocked);
  out4[3] = static_cast<double>(r->consumer_blocked);
  return 1;
}

void vhr_close(int64_t handle) {
  std::lock_guard<std::mutex> lk(g_mu);
  g_readers.erase(handle);
}

int64_t vhr_writer_open(const char* path, int width, int height, double fps,
                        const char* fourcc) {
  auto w = std::make_shared<Writer>();
  int fcc = cv::VideoWriter::fourcc(fourcc[0], fourcc[1], fourcc[2], fourcc[3]);
  if (!w->out.open(path, fcc, fps, cv::Size(width, height))) return 0;
  w->width = width;
  w->height = height;
  int64_t h = g_next.fetch_add(1);
  std::lock_guard<std::mutex> lk(g_mu);
  g_writers[h] = std::move(w);
  return h;
}

int vhr_writer_put(int64_t handle, const uint8_t* buf, int n) {
  auto w = lookup(g_writers, handle);
  if (!w) return -1;
  size_t frame_bytes = static_cast<size_t>(w->width) * w->height * 3;
  for (int i = 0; i < n; ++i) {
    cv::Mat m(w->height, w->width, CV_8UC3,
              const_cast<uint8_t*>(buf + i * frame_bytes));
    w->out.write(m);
  }
  return n;
}

void vhr_writer_close(int64_t handle) {
  std::lock_guard<std::mutex> lk(g_mu);
  g_writers.erase(handle);
}

}  // extern "C"
