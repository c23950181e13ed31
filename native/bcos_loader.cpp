// Native data-loading runtime for bcosification_tpu.
//
// Replaces the reference stack's torch DataLoader workers + SHM/Redis caching
// (bcos/data/datamodules.py, bcos/data/caching/) with a C++ thread pool that
// fuses JPEG decode (libjpeg) + resize + crop + horizontal flip + the
// AddInverse 6-channel encode into one pass writing float32 NHWC batches,
// with no Python/GIL on the hot path. Exposed as a C API consumed via ctypes
// (bcosification_tpu/data/native_loader.py).
//
// Build: make -C native   (produces libbcos_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into RGB8. Returns false on failure.
bool decode_jpeg(const std::string& path, std::vector<uint8_t>* out, int* w,
                 int* h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode an in-memory JPEG (webdataset tar members) into RGB8.
bool decode_jpeg_mem(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                     int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear sample from RGB8 (align_corners=False convention, clamped).
inline void bilinear_rgb(const uint8_t* src, int sw, int sh, float sy, float sx,
                         float* rgb) {
  sy = std::min(std::max(sy, 0.0f), float(sh - 1));
  sx = std::min(std::max(sx, 0.0f), float(sw - 1));
  int y0 = int(sy), x0 = int(sx);
  int y1 = std::min(y0 + 1, sh - 1), x1 = std::min(x0 + 1, sw - 1);
  float wy = sy - y0, wx = sx - x0;
  for (int c = 0; c < 3; ++c) {
    float a = src[(size_t(y0) * sw + x0) * 3 + c];
    float b = src[(size_t(y0) * sw + x1) * 3 + c];
    float d = src[(size_t(y1) * sw + x0) * 3 + c];
    float e = src[(size_t(y1) * sw + x1) * 3 + c];
    rgb[c] = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + d * wy * (1 - wx) +
             e * wy * wx;
  }
}

struct Sample {
  std::string path;
  int32_t label;
};

struct Batch {
  std::vector<float> images;  // [batch, H, W, C_out]
  std::vector<int32_t> labels;
  int count = 0;
};

constexpr int kModeEval = 0;   // resize shorter side to resize_size, center crop
constexpr int kModeTrain = 1;  // random resized crop + random hflip

// The fused transform on a decoded RGB8 image: crop-box selection (eval
// resize+center-crop or torchvision RandomResizedCrop semantics) + bilinear
// resample + optional hflip + [0,1] scaling + optional AddInverse. Shared by
// the ImageFolder Loader and the in-memory webdataset entry point.
void transform_rgb(const uint8_t* rgb, int w, int h, int out_size,
                   int resize_size, int channels_out, int mode,
                   std::mt19937_64& rng, float* dst) {
  const int S = out_size;
  float y0 = 0, x0 = 0, ch = h, cw = w;  // crop box in source coords
  bool flip = false;
  if (mode == kModeTrain) {
    // torchvision RandomResizedCrop(scale=(0.08,1), ratio=(3/4,4/3))
    std::uniform_real_distribution<float> uscale(0.08f, 1.0f);
    std::uniform_real_distribution<float> ulogr(std::log(3.0f / 4),
                                                std::log(4.0f / 3));
    bool found = false;
    for (int attempt = 0; attempt < 10; ++attempt) {
      float area = float(w) * h * uscale(rng);
      float ar = std::exp(ulogr(rng));
      int tw = int(std::round(std::sqrt(area * ar)));
      int th = int(std::round(std::sqrt(area / ar)));
      if (tw > 0 && th > 0 && tw <= w && th <= h) {
        std::uniform_int_distribution<int> ux(0, w - tw), uy(0, h - th);
        x0 = float(ux(rng));
        y0 = float(uy(rng));
        cw = tw;
        ch = th;
        found = true;
        break;
      }
    }
    if (!found) {  // central fallback
      float in_r = float(w) / h;
      if (in_r < 3.0f / 4) {
        cw = w;
        ch = std::round(w / (3.0f / 4));
      } else if (in_r > 4.0f / 3) {
        ch = h;
        cw = std::round(h * (4.0f / 3));
      } else {
        cw = w;
        ch = h;
      }
      x0 = (w - cw) / 2;
      y0 = (h - ch) / 2;
    }
    flip = std::uniform_real_distribution<float>(0, 1)(rng) < 0.5f;
  } else {
    // Resize shorter side to resize_size then center-crop out_size
    float scale = float(resize_size) / std::min(w, h);
    float rw = w * scale, rh = h * scale;
    // center crop box, mapped back to source coords
    float left = (rw - S) / 2.0f, top = (rh - S) / 2.0f;
    x0 = left / scale;
    y0 = top / scale;
    cw = S / scale;
    ch = S / scale;
  }
  for (int oy = 0; oy < S; ++oy) {
    for (int ox = 0; ox < S; ++ox) {
      int sample_x = flip ? (S - 1 - ox) : ox;
      float sy = y0 + (oy + 0.5f) * ch / S - 0.5f;
      float sx = x0 + (sample_x + 0.5f) * cw / S - 0.5f;
      float rgbv[3];
      bilinear_rgb(rgb, w, h, sy, sx, rgbv);
      float* px = dst + (size_t(oy) * S + ox) * channels_out;
      for (int c = 0; c < 3; ++c) {
        float v = rgbv[c] / 255.0f;
        px[c] = v;
        if (channels_out == 6) px[c + 3] = 1.0f - v;  // AddInverse
      }
    }
  }
}

class Loader {
 public:
  Loader(std::vector<Sample> samples, int out_size, int resize_size, int batch,
         int threads, int mode, int channels_out, uint64_t seed,
         int prefetch_batches)
      : samples_(std::move(samples)),
        out_size_(out_size),
        resize_size_(resize_size),
        batch_(batch),
        mode_(mode),
        channels_out_(channels_out),
        seed_(seed),
        max_queue_(std::max(prefetch_batches, 2)) {
    order_.resize(samples_.size());
    for (size_t i = 0; i < order_.size(); ++i) order_[i] = i;
    if (mode_ == kModeTrain) shuffle_epoch(0);
    n_batches_ = samples_.size() / batch_;
    if (n_batches_ == 0) n_batches_ = samples_.empty() ? 0 : 1;
    for (int t = 0; t < threads; ++t)
      workers_.emplace_back([this, t] { work(t); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void shuffle_epoch(int epoch) {
    std::mt19937_64 rng(seed_ + epoch);
    std::shuffle(order_.begin(), order_.end(), rng);
    epoch_ = epoch;
  }

  int batch_size() const { return batch_; }
  int n_batches() const { return int(n_batches_); }
  int out_size() const { return out_size_; }
  int channels_out() const { return channels_out_; }

  // Blocks until the next batch IN SUBMISSION ORDER is ready; returns items
  // copied (0 = epoch end). Workers finish decode jobs in arbitrary order, so
  // completed batches land in a reorder buffer keyed by their sequence number
  // and are emitted strictly sequentially — eval consumers (localisation
  // ranks per-sample confidences by index) depend on deterministic order.
  int next(float* images, int32_t* labels) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] {
      return stop_ || ready_.count(consumed_) || consumed_ >= n_batches_;
    });
    auto it = ready_.find(consumed_);
    if (it != ready_.end()) {
      Batch b = std::move(it->second);
      ready_.erase(it);
      consumed_++;
      lk.unlock();
      cv_space_.notify_one();
      std::memcpy(images, b.images.data(), b.images.size() * sizeof(float));
      std::memcpy(labels, b.labels.data(), b.labels.size() * sizeof(int32_t));
      return b.count;
    }
    return 0;  // epoch finished
  }

  void reset(int epoch) {
    std::unique_lock<std::mutex> lk(mu_);
    // Wait out in-flight jobs from the previous epoch so a stale batch can't
    // land in the fresh epoch's reorder buffer under a reused seq number.
    cv_data_.wait(lk, [this] { return stop_ || inflight_ == 0; });
    ready_.clear();
    next_index_ = 0;
    consumed_ = 0;
    produced_ = 0;
    if (mode_ == kModeTrain) shuffle_epoch(epoch);
    lk.unlock();
    cv_space_.notify_all();
  }

 private:
  void process_one(const Sample& s, std::mt19937_64& rng, float* dst) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    bool ok = decode_jpeg(s.path, &rgb, &w, &h);
    const int S = out_size_;
    if (!ok || w < 1 || h < 1) {
      // NEVER zero-fill: B-cos/LN layers have inf sqrt-VJP partials on
      // exact-zero rows and a zero cotangent does not save you (0*inf=NaN
      // — the repo-wide dead-slot rule). Mid-gray is harmless: with
      // AddInverse (6ch) both halves read 0.5, a valid "image".
      const float kNeutral = 0.5f;
      float* end = dst + size_t(S) * S * channels_out_;
      for (float* p = dst; p != end; ++p) *p = kNeutral;
      return;
    }
    transform_rgb(rgb.data(), w, h, out_size_, resize_size_, channels_out_,
                  mode_, rng, dst);
  }

  void work(int tid) {
    while (true) {
      size_t begin;
      {
        std::unique_lock<std::mutex> lk(mu_);
        // produce while the queue has space AND the epoch has batches left;
        // an exhausted epoch parks workers here until reset()
        // claim gate is batch-count based so a dataset smaller than one batch
        // (n_batches_ == 1, wraparound sampling) still produces its batch
        cv_space_.wait(lk, [this] {
          return stop_ || (ready_.size() + inflight_ < size_t(max_queue_) &&
                           next_index_ < n_batches_ * size_t(batch_));
        });
        if (stop_) return;
        begin = next_index_;
        next_index_ += batch_;
        inflight_++;
      }
      const size_t seq = begin / batch_;
      Batch b;
      const int S = out_size_;
      b.images.resize(size_t(batch_) * S * S * channels_out_);
      b.labels.resize(batch_);
      b.count = batch_;
      for (int i = 0; i < batch_; ++i) {
        const Sample& s = samples_[order_[(begin + i) % order_.size()]];
        b.labels[i] = s.label;
        // per-SAMPLE rng keyed by (seed, epoch, epoch-position): which
        // worker thread claims a batch is scheduling-dependent, so a
        // per-thread stream would make augmentation draws nondeterministic
        // (and divergent across the hosts of a replicated multi-process
        // run, which device_put rejects)
        std::mt19937_64 rng(seed_ ^ (uint64_t(epoch_) << 32) ^
                            (0x9E3779B97F4A7C15ull * uint64_t(begin + i + 1)));
        process_one(s, rng, b.images.data() + size_t(i) * S * S * channels_out_);
      }
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_.emplace(seq, std::move(b));
        produced_++;
        inflight_--;
      }
      // notify_all: the consumer may be waiting for a specific seq, and
      // reset() may be waiting for inflight_ == 0
      cv_data_.notify_all();
    }
  }

  std::vector<Sample> samples_;
  std::vector<size_t> order_;
  int out_size_, resize_size_, batch_, mode_, channels_out_;
  uint64_t seed_;
  int epoch_ = 0;
  int max_queue_;
  size_t n_batches_ = 0;

  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  std::map<size_t, Batch> ready_;  // seq -> completed batch (reorder buffer)
  size_t next_index_ = 0;
  size_t consumed_ = 0;
  size_t produced_ = 0;
  size_t inflight_ = 0;
  bool stop_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

// Bumped on any behavioural change. The Python binding refuses to load a
// library with a different version: the .so is checked into the repo and a
// fresh checkout gives every file the same mtime, so `make` alone cannot
// detect staleness (this exact failure shipped a pre-reorder-buffer binary
// in round 2 — eval batches came out of submission order).
int bcos_loader_abi_version() { return 6; }

void* bcos_loader_create(const char** paths, const int32_t* labels, int n,
                         int out_size, int resize_size, int batch, int threads,
                         int mode, int channels_out, uint64_t seed,
                         int prefetch_batches) {
  std::vector<Sample> samples(n);
  for (int i = 0; i < n; ++i) samples[i] = {paths[i], labels[i]};
  return new Loader(std::move(samples), out_size, resize_size, batch, threads,
                    mode, channels_out, seed, prefetch_batches);
}

int bcos_loader_next(void* loader, float* images, int32_t* labels) {
  return static_cast<Loader*>(loader)->next(images, labels);
}

int bcos_loader_n_batches(void* loader) {
  return static_cast<Loader*>(loader)->n_batches();
}

void bcos_loader_reset(void* loader, int epoch) {
  static_cast<Loader*>(loader)->reset(epoch);
}

void bcos_loader_destroy(void* loader) { delete static_cast<Loader*>(loader); }

// Standalone single-image decode+transform (for tests / eval paths).
int bcos_decode_resize(const char* path, int out_size, int resize_size,
                       int channels_out, float* dst) {
  std::vector<Sample> s{{path, 0}};
  Loader l(std::move(s), out_size, resize_size, 1, 1, kModeEval, channels_out,
           0, 2);
  std::vector<int32_t> lab(1);
  return l.next(dst, lab.data());
}

// In-memory decode + fused transform — the webdataset (CC3M tar shard) hot
// path: tar streaming stays in Python (cheap, sequential I/O), the
// decode+crop+flip+scale runs here with the GIL released, thread-pooled from
// Python. mode: 0 = eval (resize + center crop), 1 = train (RandomResizedCrop
// + hflip, driven by `seed` — pass a distinct per-sample seed for
// reproducible epochs). Returns 1 on success, 0 on a corrupt/non-JPEG buffer.
int bcos_decode_transform_mem(const uint8_t* data, long long len, int out_size,
                              int resize_size, int channels_out, int mode,
                              uint64_t seed, float* dst) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  // transform_rgb writes 3 (or 6) floats per pixel at stride channels_out —
  // reject strides that would overrun the caller's buffer
  if ((channels_out != 3 && channels_out != 6) || out_size < 1) return 0;
  if (len <= 0 || !decode_jpeg_mem(data, size_t(len), &rgb, &w, &h) || w < 1 ||
      h < 1)
    return 0;
  std::mt19937_64 rng(seed);
  transform_rgb(rgb.data(), w, h, out_size, resize_size, channels_out, mode,
                rng, dst);
  return 1;
}
}
