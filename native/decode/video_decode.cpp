// Native threaded video decode + resize pipeline (the decord equivalent).
//
// Reference analog: the torch stack decodes clips with decord
// (sgm/data/base_video_dataset.py:486-505) so the GPU never waits on python
// IO.  Here the same role is filled by a C++ worker pool over OpenCV's
// VideoCapture/imread: keyframe selection happens in python (exact fps
// resampling semantics live there), decode + bicubic resize + [-1,1] float
// conversion happen off-GIL in native threads, and frames land directly in
// caller-owned float buffers that numpy wraps without copies.
//
// C API (ctypes-friendly, no C++ types across the boundary):
//   vd_decode_clip    — synchronous: one clip (mp4/gif/webm) by frame index
//   vd_decode_images  — synchronous: a list of image files (frame dirs)
//   vd_pool_create / vd_pool_submit_clip / vd_pool_submit_images /
//   vd_pool_wait / vd_pool_destroy — threaded prefetch pool; submit returns
//   immediately, wait blocks until that job's buffer is filled.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

void frame_to_float(const cv::Mat &bgr, int h, int w, float *out) {
  cv::Mat resized;
  if (bgr.rows != h || bgr.cols != w) {
    cv::resize(bgr, resized, cv::Size(w, h), 0, 0, cv::INTER_CUBIC);
  } else {
    resized = bgr;
  }
  cv::Mat rgb;
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  const int n = h * w;
  const uint8_t *src = rgb.ptr<uint8_t>(0);
  for (int i = 0; i < n * 3; ++i) {
    out[i] = static_cast<float>(src[i]) / 127.5f - 1.0f;
  }
}

void frame_to_u8(const cv::Mat &bgr, int h, int w, uint8_t *out) {
  // raw uint8 RGB (no float conversion): the cheapest form to ship to an
  // accelerator over a slow host link (4x fewer bytes than fp32; the model
  // dequantizes on device)
  cv::Mat resized;
  if (bgr.rows != h || bgr.cols != w) {
    cv::resize(bgr, resized, cv::Size(w, h), 0, 0, cv::INTER_CUBIC);
  } else {
    resized = bgr;
  }
  cv::Mat rgb;
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  if (rgb.isContinuous()) {
    std::memcpy(out, rgb.ptr<uint8_t>(0), static_cast<size_t>(h) * w * 3);
  } else {
    for (int r = 0; r < h; ++r)
      std::memcpy(out + static_cast<size_t>(r) * w * 3, rgb.ptr<uint8_t>(r),
                  static_cast<size_t>(w) * 3);
  }
}

template <typename T, typename ConvertFn>
int decode_clip_impl_t(const char *path, const int *indices, int n_frames,
                       int h, int w, T *out, ConvertFn convert) {
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return -1;
  // single sequential sweep up to the max index (seeking is codec-fragile)
  int max_idx = 0;
  for (int i = 0; i < n_frames; ++i)
    if (indices[i] > max_idx) max_idx = indices[i];
  std::map<int, std::vector<int>> wanted;  // frame_no -> output slots
  for (int i = 0; i < n_frames; ++i) wanted[indices[i]].push_back(i);
  cv::Mat frame;
  int decoded = 0, filled = 0;
  for (int f = 0; f <= max_idx; ++f) {
    if (!cap.read(frame)) break;
    ++decoded;
    auto it = wanted.find(f);
    if (it != wanted.end()) {
      for (int slot : it->second) {
        convert(frame, h, w, out + static_cast<size_t>(slot) * h * w * 3);
        ++filled;
      }
    }
  }
  return filled == n_frames ? 0 : -2;
}

int decode_clip_impl(const char *path, const int *indices, int n_frames,
                     int h, int w, float *out) {
  return decode_clip_impl_t(path, indices, n_frames, h, w, out,
                            frame_to_float);
}

int decode_clip_u8_impl(const char *path, const int *indices, int n_frames,
                        int h, int w, uint8_t *out) {
  return decode_clip_impl_t(path, indices, n_frames, h, w, out, frame_to_u8);
}

int decode_images_impl(const char *const *paths, int n, int h, int w,
                       float *out) {
  for (int i = 0; i < n; ++i) {
    cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
    if (img.empty()) return -1;
    frame_to_float(img, h, w, out + static_cast<size_t>(i) * h * w * 3);
  }
  return 0;
}

struct Job {
  uint64_t id;
  bool is_clip;
  std::string path;                 // clip
  std::vector<std::string> files;   // images
  std::vector<int> indices;
  int h, w;
  float *out;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Job> queue;
  std::map<uint64_t, int> done;  // job id -> status
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  bool stop = false;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers.emplace_back([this] { run(); });
    }
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      int status;
      if (job.is_clip) {
        status = decode_clip_impl(job.path.c_str(), job.indices.data(),
                                  static_cast<int>(job.indices.size()), job.h,
                                  job.w, job.out);
      } else {
        std::vector<const char *> ptrs;
        ptrs.reserve(job.files.size());
        for (auto &f : job.files) ptrs.push_back(f.c_str());
        status = decode_images_impl(ptrs.data(),
                                    static_cast<int>(ptrs.size()), job.h,
                                    job.w, job.out);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.id] = status;
      }
      cv_done.notify_all();
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto &t : workers) t.join();
  }
};

}  // namespace

extern "C" {

int vd_decode_clip(const char *path, const int *indices, int n_frames, int h,
                   int w, float *out) {
  return decode_clip_impl(path, indices, n_frames, h, w, out);
}

int vd_decode_clip_u8(const char *path, const int *indices, int n_frames,
                      int h, int w, uint8_t *out) {
  return decode_clip_u8_impl(path, indices, n_frames, h, w, out);
}

int vd_decode_images(const char *const *paths, int n, int h, int w,
                     float *out) {
  return decode_images_impl(paths, n, h, w, out);
}

void *vd_pool_create(int n_threads) {
  return new Pool(n_threads > 0 ? n_threads : 4);
}

int vd_pool_submit_clip(void *pool, uint64_t job_id, const char *path,
                        const int *indices, int n_frames, int h, int w,
                        float *out) {
  auto *p = static_cast<Pool *>(pool);
  Job job;
  job.id = job_id;
  job.is_clip = true;
  job.path = path;
  job.indices.assign(indices, indices + n_frames);
  job.h = h;
  job.w = w;
  job.out = out;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.push_back(std::move(job));
  }
  p->cv_work.notify_one();
  return 0;
}

int vd_pool_submit_images(void *pool, uint64_t job_id,
                          const char *const *paths, int n, int h, int w,
                          float *out) {
  auto *p = static_cast<Pool *>(pool);
  Job job;
  job.id = job_id;
  job.is_clip = false;
  for (int i = 0; i < n; ++i) job.files.emplace_back(paths[i]);
  job.h = h;
  job.w = w;
  job.out = out;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.push_back(std::move(job));
  }
  p->cv_work.notify_one();
  return 0;
}

int vd_pool_wait(void *pool, uint64_t job_id) {
  auto *p = static_cast<Pool *>(pool);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done.count(job_id) > 0; });
  int status = p->done[job_id];
  p->done.erase(job_id);
  return status;
}

void vd_pool_destroy(void *pool) { delete static_cast<Pool *>(pool); }

}  // extern "C"
