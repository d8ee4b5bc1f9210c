// Native data batcher: threaded, double-buffered batch assembly with fused
// gather + per-channel normalize.
//
// The reference delegates host-side input work to torch DataLoader worker
// processes (reference: ot_vae_lightning/data/base.py:88-99). On TPU the
// equivalent bottleneck is assembling the next host batch while the chip
// computes; this component overlaps that work with device compute from a
// single C++ worker thread, avoiding Python-process fan-out entirely.
//
// C ABI (consumed via ctypes from ot_vae_tpu/data/native_loader.py):
//   ot_batcher_create(images, labels, n, item_size, channels, batch_size,
//                     mean, std, seed) -> handle
//   ot_batcher_start_epoch(handle, epoch, shuffle)
//   ot_batcher_next(handle, out_images, out_labels) -> 1 (batch) | 0 (done)
//   ot_batcher_destroy(handle)
//
// The caller keeps the images/labels arrays alive for the handle's lifetime.
// Shuffling is a seeded Fisher–Yates over splitmix64 — deterministic for a
// given (seed, epoch) on every platform.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

// splitmix64: tiny, high-quality, platform-independent PRNG.
struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
  }
  // unbiased bounded draw (Lemire)
  uint64_t below(uint64_t bound) {
    while (true) {
      uint64_t x = next();
      __uint128_t m = (__uint128_t)x * bound;
      uint64_t l = (uint64_t)m;
      if (l >= (-bound) % bound) return (uint64_t)(m >> 64);
    }
  }
};

struct Batcher {
  const float* images;    // [n, item_size]
  const int32_t* labels;  // [n]
  int64_t n;
  int64_t item_size;      // H*W*C
  int64_t channels;       // C (for per-channel normalize)
  int64_t batch_size;
  uint64_t seed;
  bool normalize;
  std::vector<float> scale;   // 1/std per channel
  std::vector<float> shift;   // -mean/std per channel

  std::vector<int64_t> perm;
  int64_t cursor = 0;  // next batch index handed to the consumer

  // double buffer filled by the worker thread
  std::vector<float> buf_images[2];
  std::vector<int32_t> buf_labels[2];
  int buf_ready[2] = {0, 0};   // 1 = filled, -1 = end-of-epoch
  int64_t fill_cursor = 0;     // next batch index the worker will fill
  int next_slot = 0;           // slot the consumer reads next

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<bool> stop{false};
  bool epoch_active = false;

  void fill_batch(int slot) {
    float* out = buf_images[slot].data();
    int32_t* lab = buf_labels[slot].data();
    const int64_t start = fill_cursor * batch_size;
    for (int64_t b = 0; b < batch_size; ++b) {
      const int64_t src = perm[start + b];
      const float* row = images + src * item_size;
      float* dst = out + b * item_size;
      if (normalize) {
        // fused gather + normalize: one pass, channel-minor (NHWC) layout
        for (int64_t i = 0; i < item_size; ++i) {
          const int64_t c = i % channels;
          dst[i] = row[i] * scale[c] + shift[c];
        }
      } else {
        std::memcpy(dst, row, sizeof(float) * item_size);
      }
      lab[b] = labels[src];
    }
  }

  void worker_loop() {
    const int64_t num_batches = n / batch_size;
    while (true) {
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] {
        return stop.load() ||
               (epoch_active && fill_cursor < num_batches &&
                buf_ready[fill_cursor & 1] == 0);
      });
      if (stop.load()) return;
      const int slot = fill_cursor & 1;
      lk.unlock();
      fill_batch(slot);  // heavy work outside the lock
      lk.lock();
      buf_ready[slot] = 1;
      ++fill_cursor;
      if (fill_cursor >= num_batches) epoch_active = false;
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* ot_batcher_create(const float* images, const int32_t* labels, int64_t n,
                        int64_t item_size, int64_t channels,
                        int64_t batch_size, const float* mean,
                        const float* std_, uint64_t seed) {
  auto* b = new Batcher();
  b->images = images;
  b->labels = labels;
  b->n = n;
  b->item_size = item_size;
  b->channels = channels;
  b->batch_size = batch_size;
  b->seed = seed;
  b->normalize = (mean != nullptr && std_ != nullptr);
  if (b->normalize) {
    b->scale.resize(channels);
    b->shift.resize(channels);
    for (int64_t c = 0; c < channels; ++c) {
      b->scale[c] = 1.0f / std_[c];
      b->shift[c] = -mean[c] / std_[c];
    }
  }
  b->perm.resize(n);
  for (int i = 0; i < 2; ++i) {
    b->buf_images[i].resize(batch_size * item_size);
    b->buf_labels[i].resize(batch_size);
  }
  b->worker = std::thread([b] { b->worker_loop(); });
  return b;
}

void ot_batcher_start_epoch(void* handle, int64_t epoch, int shuffle) {
  auto* b = static_cast<Batcher*>(handle);
  std::unique_lock<std::mutex> lk(b->mu);
  for (int64_t i = 0; i < b->n; ++i) b->perm[i] = i;
  if (shuffle) {
    SplitMix64 rng(b->seed * 0x100000001b3ull + (uint64_t)epoch);
    for (int64_t i = b->n - 1; i > 0; --i) {
      const int64_t j = (int64_t)rng.below((uint64_t)i + 1);
      std::swap(b->perm[i], b->perm[j]);
    }
  }
  b->cursor = 0;
  b->fill_cursor = 0;
  b->next_slot = 0;
  b->buf_ready[0] = b->buf_ready[1] = 0;
  b->epoch_active = true;
  b->cv.notify_all();  // worker starts prefetching batch 0 (then 1)
}

int ot_batcher_next(void* handle, float* out_images, int32_t* out_labels) {
  auto* b = static_cast<Batcher*>(handle);
  const int64_t num_batches = b->n / b->batch_size;
  if (b->cursor >= num_batches) return 0;
  const int slot = b->next_slot;
  {
    std::unique_lock<std::mutex> lk(b->mu);
    b->cv.wait(lk, [&] { return b->buf_ready[slot] == 1; });
  }
  std::memcpy(out_images, b->buf_images[slot].data(),
              sizeof(float) * b->batch_size * b->item_size);
  std::memcpy(out_labels, b->buf_labels[slot].data(),
              sizeof(int32_t) * b->batch_size);
  {
    std::unique_lock<std::mutex> lk(b->mu);
    b->buf_ready[slot] = 0;  // hand the slot back to the worker
    ++b->cursor;
    b->next_slot = slot ^ 1;
    b->cv.notify_all();
  }
  return 1;
}

void ot_batcher_destroy(void* handle) {
  auto* b = static_cast<Batcher*>(handle);
  {
    std::unique_lock<std::mutex> lk(b->mu);
    b->stop.store(true);
    b->cv.notify_all();
  }
  b->worker.join();
  delete b;
}

}  // extern "C"
