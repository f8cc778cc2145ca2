// Native host runtime: binary sequence-log IO + trajectory metrics.
//
// The reference's host-side runtime is C++ throughout (rosbag playback,
// dataset runner, src/runner/dpg_data_runner_main.cc). The TPU rebuild keeps
// the compute path in XLA but implements the data-plane runtime natively:
// mmap-based .dsl log reading (zero-copy into the Python caller's buffers),
// log writing, and the ATE/RPE metric kernels used by the evaluation
// harness. Exposed as a plain C ABI consumed via ctypes
// (dpg_slam_tpu/io/logs.py, dpg_slam_tpu/utils/metrics.py).
//
// .dsl layout (little endian):
//   u32 magic 'DPL1' (0x44504C31) | u32 T | u32 B | u32 flags(bit0: has gt)
//   f32 scans[T*B] | f32 odometry[T*3] | f32 ground_truth[T*3 iff flag]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x44504C31;

struct Header {
  uint32_t magic;
  uint32_t t;
  uint32_t b;
  uint32_t flags;
};

struct MappedFile {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) return false;
    size = static_cast<size_t>(st.st_size);
    data = static_cast<const uint8_t*>(
        mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
    return data != MAP_FAILED;
  }

  ~MappedFile() {
    if (data && data != MAP_FAILED) munmap(const_cast<uint8_t*>(data), size);
    if (fd >= 0) close(fd);
  }
};

}  // namespace

extern "C" {

// Returns 0 on success; negative error codes otherwise.
int dsl_read_header(const char* path, uint32_t* t, uint32_t* b, uint32_t* flags) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  if (mf.size < sizeof(Header)) return -2;
  Header h;
  memcpy(&h, mf.data, sizeof(Header));
  if (h.magic != kMagic) return -3;
  *t = h.t;
  *b = h.b;
  *flags = h.flags;
  return 0;
}

int dsl_read(const char* path, float* scans, float* odometry, float* ground_truth) {
  MappedFile mf;
  if (!mf.open(path)) return -1;
  if (mf.size < sizeof(Header)) return -2;
  Header h;
  memcpy(&h, mf.data, sizeof(Header));
  if (h.magic != kMagic) return -3;
  const size_t scans_bytes = static_cast<size_t>(h.t) * h.b * sizeof(float);
  const size_t pose_bytes = static_cast<size_t>(h.t) * 3 * sizeof(float);
  size_t need = sizeof(Header) + scans_bytes + pose_bytes;
  if (h.flags & 1) need += pose_bytes;
  if (mf.size < need) return -4;
  const uint8_t* p = mf.data + sizeof(Header);
  memcpy(scans, p, scans_bytes);
  p += scans_bytes;
  memcpy(odometry, p, pose_bytes);
  p += pose_bytes;
  if (h.flags & 1) memcpy(ground_truth, p, pose_bytes);
  return 0;
}

int dsl_write(const char* path, uint32_t t, uint32_t b, uint32_t flags,
              const float* scans, const float* odometry,
              const float* ground_truth) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header h{kMagic, t, b, flags};
  int ok = 1;
  ok &= fwrite(&h, sizeof(Header), 1, f) == 1;
  ok &= fwrite(scans, sizeof(float), static_cast<size_t>(t) * b, f) ==
        static_cast<size_t>(t) * b;
  ok &= fwrite(odometry, sizeof(float), static_cast<size_t>(t) * 3, f) ==
        static_cast<size_t>(t) * 3;
  if (flags & 1) {
    ok &= fwrite(ground_truth, sizeof(float), static_cast<size_t>(t) * 3, f) ==
          static_cast<size_t>(t) * 3;
  }
  fclose(f);
  return ok ? 0 : -2;
}

// Position RMSE between two (n, 3) pose arrays (ATE without alignment;
// both trajectories in the shared anchored frame — see utils/metrics.py).
double traj_ate_rmse(const float* est, const float* ref, uint32_t n) {
  double acc = 0.0;
  for (uint32_t i = 0; i < n; i++) {
    const double dx = static_cast<double>(est[i * 3]) - ref[i * 3];
    const double dy = static_cast<double>(est[i * 3 + 1]) - ref[i * 3 + 1];
    acc += dx * dx + dy * dy;
  }
  return n ? std::sqrt(acc / n) : 0.0;
}

}  // extern "C"
