// rvdd_io: native data-plane for the rvdd_tpu framework.
//
// Plays the role of the reference's native IO layer (the vendored iio C
// library + DataLoader worker processes): a small TIFF codec for the
// dataset formats this framework reads/writes (uncompressed, chunky,
// little-endian, uint8/uint16/float32, 1-4 samples) and a pthread
// prefetch pool that decodes whole frame batches in parallel while the
// accelerator computes.
//
// Exposed as extern "C" for ctypes (no pybind11 in this image).
//
// Build: make -C native   ->  native/librvdd_io.so

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct TiffEntry {
  uint16_t tag;
  uint16_t type;
  uint32_t count;
  uint32_t value;
};
#pragma pack(pop)

struct ImageInfo {
  uint32_t width = 0, height = 0, channels = 1;
  uint32_t bits = 8;
  uint32_t sample_format = 1;  // 1 = uint, 3 = float
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(n);
  size_t got = fread(out.data(), 1, n, f);
  fclose(f);
  return got == (size_t)n;
}

uint32_t entry_scalar(const TiffEntry& e) {
  // value field holds the scalar inline for count==1 short/long
  if (e.type == 3) return e.value & 0xFFFF;
  return e.value;
}

// Parse the classic-TIFF subset we emit (II, uncompressed, chunky,
// strip-based). Returns false on anything else.
bool parse_tiff(const std::vector<uint8_t>& d, ImageInfo* info,
                std::vector<std::pair<uint32_t, uint32_t>>* strips,
                uint32_t* rows_per_strip) {
  if (d.size() < 8 || d[0] != 'I' || d[1] != 'I') return false;
  uint32_t ifd;
  memcpy(&ifd, d.data() + 4, 4);
  if (ifd + 2 > d.size()) return false;
  uint16_t n;
  memcpy(&n, d.data() + ifd, 2);
  if (ifd + 2 + 12u * n > d.size()) return false;

  uint32_t compression = 1, planar = 1;
  std::vector<uint32_t> offsets, counts;
  *rows_per_strip = 0xFFFFFFFF;

  for (uint16_t i = 0; i < n; i++) {
    TiffEntry e;
    memcpy(&e, d.data() + ifd + 2 + 12 * i, 12);
    switch (e.tag) {
      case 256: info->width = entry_scalar(e); break;
      case 257: info->height = entry_scalar(e); break;
      case 258: {
        if (e.count == 1) {
          info->bits = entry_scalar(e);
        } else {
          uint16_t b;
          memcpy(&b, d.data() + e.value, 2);
          info->bits = b;
        }
        break;
      }
      case 259: compression = entry_scalar(e); break;
      case 273: {
        if (e.count == 1) {
          offsets.push_back(e.value);
        } else {
          offsets.resize(e.count);
          for (uint32_t k = 0; k < e.count; k++)
            memcpy(&offsets[k], d.data() + e.value + 4 * k, 4);
        }
        break;
      }
      case 277: info->channels = entry_scalar(e); break;
      case 278: *rows_per_strip = entry_scalar(e); break;
      case 279: {
        if (e.count == 1) {
          counts.push_back(e.value);
        } else {
          counts.resize(e.count);
          for (uint32_t k = 0; k < e.count; k++)
            memcpy(&counts[k], d.data() + e.value + 4 * k, 4);
        }
        break;
      }
      case 284: planar = entry_scalar(e); break;
      case 339: {
        if (e.count == 1) {
          info->sample_format = entry_scalar(e);
        } else {
          uint16_t s;
          memcpy(&s, d.data() + e.value, 2);
          info->sample_format = s;
        }
        break;
      }
      default: break;
    }
  }
  if (compression != 1 || planar != 1) return false;
  if (offsets.size() != counts.size() || offsets.empty()) return false;
  strips->clear();
  for (size_t k = 0; k < offsets.size(); k++)
    strips->push_back({offsets[k], counts[k]});
  return info->width && info->height;
}

// decode a TIFF into float32 HWC, normalizing by `scale` (0 = raw values)
bool decode_to_float(const char* path, float* out, int64_t out_cap,
                     ImageInfo* info, float scale) {
  std::vector<uint8_t> d;
  if (!read_file(path, d)) return false;
  std::vector<std::pair<uint32_t, uint32_t>> strips;
  uint32_t rps;
  if (!parse_tiff(d, info, &strips, &rps)) return false;
  const int64_t total =
      (int64_t)info->width * info->height * info->channels;
  if (total > out_cap) return false;
  const float mul = scale > 0 ? 1.0f / scale : 1.0f;

  int64_t idx = 0;
  for (auto& s : strips) {
    if (s.first + s.second > d.size()) return false;
    const uint8_t* p = d.data() + s.first;
    int64_t vals;
    if (info->sample_format == 3 && info->bits == 32) {
      vals = s.second / 4;
      if (vals > total - idx) vals = total - idx;
      if (scale <= 0) {  // fast path: plain copy
        memcpy(out + idx, p, vals * 4);
        idx += vals;
      } else {
        const float* fp = reinterpret_cast<const float*>(p);
        for (int64_t k = 0; k < vals; k++) out[idx++] = fp[k] * mul;
      }
    } else if (info->bits == 16) {
      vals = s.second / 2;
      const uint16_t* up = reinterpret_cast<const uint16_t*>(p);
      for (int64_t k = 0; k < vals && idx < total; k++) out[idx++] = up[k] * mul;
    } else if (info->bits == 8) {
      vals = s.second;
      for (int64_t k = 0; k < vals && idx < total; k++) out[idx++] = p[k] * mul;
    } else {
      return false;
    }
  }
  return idx == total;
}

// --------------------------------------------------------------------------
// prefetch pool: decode many frames concurrently into one dense output
// --------------------------------------------------------------------------

struct Job {
  std::string path;
  float* dst;
  int64_t cap;
  float scale;
  int* status;  // 0 pending, 1 ok, -1 failed
  int64_t* shape3;  // h, w, c
};

class Pool {
 public:
  explicit Pool(int workers) : stop_(false), pending_(0) {
    for (int i = 0; i < workers; i++)
      threads_.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  void submit(Job j) {
    {
      std::lock_guard<std::mutex> g(mu_);
      q_.push(std::move(j));
      pending_++;
    }
    cv_.notify_one();
  }
  void wait_all() {
    std::unique_lock<std::mutex> g(mu_);
    done_cv_.wait(g, [this] { return pending_ == 0; });
  }

 private:
  void run() {
    for (;;) {
      Job j;
      {
        std::unique_lock<std::mutex> g(mu_);
        cv_.wait(g, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        j = std::move(q_.front());
        q_.pop();
      }
      ImageInfo info;
      bool ok = decode_to_float(j.path.c_str(), j.dst, j.cap, &info, j.scale);
      *j.status = ok ? 1 : -1;
      if (ok && j.shape3) {
        j.shape3[0] = info.height;
        j.shape3[1] = info.width;
        j.shape3[2] = info.channels;
      }
      {
        std::lock_guard<std::mutex> g(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::queue<Job> q_;
  std::vector<std::thread> threads_;
  bool stop_;
  int pending_;
};

}  // namespace

extern "C" {

// Single-image decode. Returns 0 on success; shape3 receives (h, w, c).
int rvdd_read_image(const char* path, float* out, int64_t out_cap,
                    int64_t* shape3, float scale) {
  ImageInfo info;
  if (!decode_to_float(path, out, out_cap, &info, scale)) return -1;
  shape3[0] = info.height;
  shape3[1] = info.width;
  shape3[2] = info.channels;
  return 0;
}

void* rvdd_pool_create(int workers) { return new Pool(workers); }
void rvdd_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Batch decode: n frames of identical shape into a dense [n, h*w*c] buffer.
// statuses must be an int array of length n. Blocks until all are done;
// returns the number of failures.
int rvdd_pool_read_batch(void* pool, const char** paths, int n, float* out,
                         int64_t frame_floats, float scale, int* statuses) {
  Pool* p = static_cast<Pool*>(pool);
  std::vector<int64_t> shapes(3 * n);
  for (int i = 0; i < n; i++) {
    statuses[i] = 0;
    Job j;
    j.path = paths[i];
    j.dst = out + (int64_t)i * frame_floats;
    j.cap = frame_floats;
    j.scale = scale;
    j.status = &statuses[i];
    j.shape3 = &shapes[3 * i];
    p->submit(std::move(j));
  }
  p->wait_all();
  int failures = 0;
  for (int i = 0; i < n; i++)
    if (statuses[i] != 1) failures++;
  return failures;
}

}  // extern "C"
