// hyperio — native measurement-streaming runtime for hyperslam_tpu.
//
// TPU-native replacement for the reference's ROS ingestion machinery
// (roscpp topic subscriptions feeding per-module callback queues with an
// AsyncSpinner thread pool — /root/reference/internal/hyper/system/
// components/module.cpp:45-67; SURVEY.md §5.8).  Instead of a ROS graph,
// this library:
//
//   * parses EuRoC ASL csv indexes (imu0/data.csv, cam{0,1}/data.csv),
//   * pairs stereo frames by timestamp with a tolerance (the reference's
//     stamp-pairing queue, klt.cpp:162-198),
//   * merges IMU and stereo streams into one time-ordered event sequence,
//   * decodes 8-bit grayscale PNGs (zlib inflate + PNG unfiltering) on a
//     background prefetch thread with a bounded ring buffer, so image IO
//     overlaps the consumer's compute (the reference's AsyncSpinner role).
//
// C ABI for ctypes; no Python dependencies.  Build: make -C native.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------- //
// PNG decode (8-bit grayscale, the EuRoC camera format)
// ---------------------------------------------------------------------- //

struct Image {
  int width = 0, height = 0;
  std::vector<uint8_t> pixels;  // row-major, grayscale
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Minimal PNG reader: 8-bit grayscale or RGB(A) (converted to gray),
// no interlacing.  Returns false on any unsupported feature.
bool decode_png(const std::string& path, Image* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> data((std::istreambuf_iterator<char>(f)),
                            std::istreambuf_iterator<char>());
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (data.size() < 8 || std::memcmp(data.data(), kSig, 8) != 0) return false;

  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= data.size()) {
    uint32_t len = be32(&data[pos]);
    if (pos + 12 + len > data.size()) return false;
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const uint8_t* payload = &data[pos + 8];
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;
      w = be32(payload);
      h = be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      if (payload[12] != 0) return false;  // interlaced unsupported
      if (bit_depth != 8) return false;
      if (color_type != 0 && color_type != 2 && color_type != 6) return false;
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || idat.empty()) return false;

  int channels = color_type == 0 ? 1 : (color_type == 2 ? 3 : 4);
  size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  // Unfilter per scanline, then convert to grayscale.
  std::vector<uint8_t> img(stride * h);
  const int bpp = channels;
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &img[y * stride];
    const uint8_t* up = y ? &img[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }

  out->width = int(w);
  out->height = int(h);
  out->pixels.resize(size_t(w) * h);
  if (channels == 1) {
    out->pixels.assign(img.begin(), img.end());
  } else {
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      const uint8_t* px = &img[i * channels];
      // integer BT.601 luma
      out->pixels[i] =
          uint8_t((77 * px[0] + 150 * px[1] + 29 * px[2]) >> 8);
    }
  }
  return true;
}

// ---------------------------------------------------------------------- //
// EuRoC csv parsing + stream merge
// ---------------------------------------------------------------------- //

struct ImuSample {
  double stamp;
  double gyro[3];
  double accel[3];
};

struct StereoFrame {
  double stamp;
  std::string path0, path1;
};

bool parse_imu_csv(const std::string& path, std::vector<ImuSample>* out) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    ImuSample s;
    long long ns;
    if (std::sscanf(line.c_str(), "%lld,%lf,%lf,%lf,%lf,%lf,%lf", &ns,
                    &s.gyro[0], &s.gyro[1], &s.gyro[2], &s.accel[0],
                    &s.accel[1], &s.accel[2]) == 7) {
      s.stamp = double(ns) * 1e-9;
      out->push_back(s);
    }
  }
  return true;
}

bool parse_cam_csv(const std::string& path,
                   std::vector<std::pair<double, std::string>>* out) {
  std::ifstream f(path);
  if (!f) return false;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    auto comma = line.find(',');
    if (comma == std::string::npos) continue;
    long long ns = std::atoll(line.substr(0, comma).c_str());
    std::string name = line.substr(comma + 1);
    while (!name.empty() && (name.back() == '\r' || name.back() == '\n' ||
                             name.back() == ' ')) {
      name.pop_back();
    }
    out->emplace_back(double(ns) * 1e-9, name);
  }
  return true;
}

// ---------------------------------------------------------------------- //
// event stream with prefetch
// ---------------------------------------------------------------------- //

struct Event {
  int type;  // 0 = imu, 1 = stereo
  double stamp;
  ImuSample imu;           // valid when type == 0
  Image img0, img1;        // valid when type == 1
};

class Stream {
 public:
  Stream(const std::string& mav0, bool use_imu, double max_duration,
         int prefetch)
      : prefetch_(std::max(prefetch, 1)) {
    std::vector<ImuSample> imu;
    if (use_imu) parse_imu_csv(mav0 + "/imu0/data.csv", &imu);
    std::vector<std::pair<double, std::string>> c0, c1;
    parse_cam_csv(mav0 + "/cam0/data.csv", &c0);
    parse_cam_csv(mav0 + "/cam1/data.csv", &c1);

    // stereo pairing by stamp (tolerance 3 ms, reference klt.cpp:162-198)
    std::vector<StereoFrame> frames;
    size_t j = 0;
    for (auto& [t, name] : c0) {
      while (j + 1 < c1.size() &&
             std::abs(c1[j + 1].first - t) < std::abs(c1[j].first - t)) {
        ++j;
      }
      if (j < c1.size() && std::abs(c1[j].first - t) < 0.003) {
        frames.push_back({t, mav0 + "/cam0/data/" + name,
                          mav0 + "/cam1/data/" + c1[j].second});
      }
    }

    double t_base = 1e300;
    if (!imu.empty()) t_base = imu.front().stamp;
    if (!frames.empty()) t_base = std::min(t_base, frames.front().stamp);

    // merged, time-ordered plan (IMU before images at equal stamps,
    // matching the reference's callback ordering)
    size_t ii = 0, fi = 0;
    while (ii < imu.size() || fi < frames.size()) {
      bool take_imu =
          fi >= frames.size() ||
          (ii < imu.size() && imu[ii].stamp <= frames[fi].stamp);
      double t = take_imu ? imu[ii].stamp : frames[fi].stamp;
      if (max_duration > 0 && t - t_base > max_duration) break;
      if (take_imu) {
        plan_.push_back({0, ii++});
      } else {
        plan_.push_back({1, fi++});
      }
    }
    imu_ = std::move(imu);
    frames_ = std::move(frames);
    worker_ = std::thread([this] { Produce(); });
  }

  ~Stream() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    if (worker_.joinable()) worker_.join();
  }

  // Returns nullptr at end of stream.
  std::unique_ptr<Event> Next() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_data_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
    if (queue_.empty()) return nullptr;
    auto ev = std::move(queue_.front());
    queue_.pop_front();
    cv_space_.notify_one();
    return ev;
  }

 private:
  void Produce() {
    for (auto& [kind, idx] : plan_) {
      auto ev = std::make_unique<Event>();
      if (kind == 0) {
        ev->type = 0;
        ev->imu = imu_[idx];
        ev->stamp = ev->imu.stamp;
      } else {
        ev->type = 1;
        ev->stamp = frames_[idx].stamp;
        if (!decode_png(frames_[idx].path0, &ev->img0) ||
            !decode_png(frames_[idx].path1, &ev->img1)) {
          continue;  // skip unreadable frames (degrade, don't die)
        }
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_space_.wait(lk, [this] {
        return queue_.size() < size_t(prefetch_) || stop_;
      });
      if (stop_) return;
      queue_.push_back(std::move(ev));
      cv_data_.notify_one();
    }
    std::lock_guard<std::mutex> lk(mu_);
    done_ = true;
    cv_data_.notify_all();
  }

  std::vector<std::pair<int, size_t>> plan_;
  std::vector<ImuSample> imu_;
  std::vector<StereoFrame> frames_;
  std::deque<std::unique_ptr<Event>> queue_;
  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  bool done_ = false;
  bool stop_ = false;
  int prefetch_;
  std::thread worker_;
};

}  // namespace

// ------------------------------------------------------------------------ //
// C ABI
// ------------------------------------------------------------------------ //

extern "C" {

struct HyperIoEvent {
  int type;       // 0 imu, 1 stereo, -1 end
  double stamp;
  double gyro[3];
  double accel[3];
  int width, height;
  const uint8_t* img0;  // valid until the next hyperio_next / close
  const uint8_t* img1;
};

struct HyperIoHandle {
  Stream* stream;
  std::unique_ptr<Event> current;
};

void* hyperio_open(const char* mav0_path, int use_imu, double max_duration,
                   int prefetch) {
  auto* h = new HyperIoHandle();
  h->stream = new Stream(mav0_path, use_imu != 0, max_duration, prefetch);
  return h;
}

int hyperio_next(void* handle, HyperIoEvent* out) {
  auto* h = static_cast<HyperIoHandle*>(handle);
  h->current = h->stream->Next();
  if (!h->current) {
    out->type = -1;
    return -1;
  }
  Event& ev = *h->current;
  out->type = ev.type;
  out->stamp = ev.stamp;
  if (ev.type == 0) {
    std::memcpy(out->gyro, ev.imu.gyro, sizeof(out->gyro));
    std::memcpy(out->accel, ev.imu.accel, sizeof(out->accel));
    out->width = out->height = 0;
    out->img0 = out->img1 = nullptr;
  } else {
    out->width = ev.img0.width;
    out->height = ev.img0.height;
    out->img0 = ev.img0.pixels.data();
    out->img1 = ev.img1.pixels.data();
  }
  return ev.type;
}

void hyperio_close(void* handle) {
  auto* h = static_cast<HyperIoHandle*>(handle);
  delete h->stream;
  delete h;
}

// standalone PNG decode helper (for tests / tools)
int hyperio_decode_png(const char* path, uint8_t* out, int capacity,
                       int* width, int* height) {
  Image img;
  if (!decode_png(path, &img)) return -1;
  if (int(img.pixels.size()) > capacity) return -2;
  std::memcpy(out, img.pixels.data(), img.pixels.size());
  *width = img.width;
  *height = img.height;
  return 0;
}

}  // extern "C"
