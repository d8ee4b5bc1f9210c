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
//   ot_batcher_create(images, labels, n, height, width, channels, batch_size,
//                     mean, std, pad, seed) -> handle
//   ot_batcher_start_epoch(handle, epoch, shuffle)
//   ot_batcher_next(handle, out_images, out_labels) -> 1 (batch) | 0 (done)
//   ot_batcher_destroy(handle)
//
// `pad` zero-pads H and W by `pad` on each side AFTER normalization — the
// fused form of Compose([Normalize, Pad(p)]) (e.g. the MNIST32 eval
// transform). np.pad writes exact zeros and the interior runs the same IEEE
// float32 (x - mean) / std, so the output is bit-identical to the Python
// transform chain.
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
  const float* images;    // [n, H, W, C]
  const int32_t* labels;  // [n]
  int64_t n;
  int64_t height, width;
  int64_t channels;       // C (for per-channel normalize)
  int64_t item_size;      // H*W*C (source row size)
  int64_t out_size;       // (H+2p)*(W+2p)*C (output row size)
  int64_t pad = 0;        // zero-pad per side on H and W, applied post-norm
  int64_t batch_size;
  uint64_t seed;
  bool normalize;
  // Kept as (mean, std) and applied as (x - mean) / std — the exact same two
  // IEEE float32 operations the NumPy Normalize transform performs — so the
  // unshuffled batch stream is BIT-IDENTICAL to the Python path (required for
  // the loader to be the default on val/test without shifting seeded metric
  // floors). Do not "optimize" into x*(1/std) + (-mean/std): FMA/reciprocal
  // rounding breaks the bit parity.
  std::vector<float> norm_mean;
  std::vector<float> norm_std;

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
  // Epoch-restart safety (a consumer may abandon an epoch mid-stream, e.g.
  // the trainer's limit_batches breaking out of a val loop, and immediately
  // start the next one): `filling` marks an in-flight fill_batch (which
  // runs OUTSIDE the lock and reads perm/fill_cursor), and `generation`
  // stamps the epoch it belongs to. start_epoch waits until the worker is
  // idle before rewriting perm, and the worker discards a completed fill
  // whose generation no longer matches instead of publishing it.
  bool filling = false;
  uint64_t generation = 0;

  // Copy/normalize `count` contiguous channel-minor floats.
  void emit_line(const float* src_line, float* dst_line, int64_t count) {
    if (normalize) {
      for (int64_t i = 0; i < count; ++i) {
        const int64_t c = i % channels;
        dst_line[i] = (src_line[i] - norm_mean[c]) / norm_std[c];
      }
    } else {
      std::memcpy(dst_line, src_line, sizeof(float) * count);
    }
  }

  void fill_batch(int slot) {
    float* out = buf_images[slot].data();
    int32_t* lab = buf_labels[slot].data();
    const int64_t start = fill_cursor * batch_size;
    const int64_t out_w = width + 2 * pad;
    for (int64_t b = 0; b < batch_size; ++b) {
      const int64_t src = perm[start + b];
      const float* row = images + src * item_size;
      float* dst = out + b * out_size;
      if (pad == 0) {
        emit_line(row, dst, item_size);  // whole item is contiguous
      } else {
        std::memset(dst, 0, sizeof(float) * out_size);  // exact-zero border
        for (int64_t h = 0; h < height; ++h) {
          emit_line(row + h * width * channels,
                    dst + ((h + pad) * out_w + pad) * channels,
                    width * channels);
        }
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
      const uint64_t gen = generation;
      filling = true;
      lk.unlock();
      fill_batch(slot);  // heavy work outside the lock
      lk.lock();
      filling = false;
      if (generation == gen) {  // discard a fill from an abandoned epoch
        buf_ready[slot] = 1;
        ++fill_cursor;
        if (fill_cursor >= num_batches) epoch_active = false;
      }
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* ot_batcher_create(const float* images, const int32_t* labels, int64_t n,
                        int64_t height, int64_t width, int64_t channels,
                        int64_t batch_size, const float* mean,
                        const float* std_, int64_t pad, uint64_t seed) {
  auto* b = new Batcher();
  b->images = images;
  b->labels = labels;
  b->n = n;
  b->height = height;
  b->width = width;
  b->channels = channels;
  b->item_size = height * width * channels;
  b->out_size = (height + 2 * pad) * (width + 2 * pad) * channels;
  b->pad = pad;
  b->batch_size = batch_size;
  b->seed = seed;
  b->normalize = (mean != nullptr && std_ != nullptr);
  if (b->normalize) {
    b->norm_mean.assign(mean, mean + channels);
    b->norm_std.assign(std_, std_ + channels);
  }
  b->perm.resize(n);
  for (int i = 0; i < 2; ++i) {
    b->buf_images[i].resize(batch_size * b->out_size);
    b->buf_labels[i].resize(batch_size);
  }
  b->worker = std::thread([b] { b->worker_loop(); });
  return b;
}

void ot_batcher_start_epoch(void* handle, int64_t epoch, int shuffle) {
  auto* b = static_cast<Batcher*>(handle);
  std::unique_lock<std::mutex> lk(b->mu);
  // Quiesce the worker: stop it from STARTING a new fill, then wait out any
  // in-flight one — fill_batch reads perm/fill_cursor unlocked, so rewriting
  // them below while it runs would be a C++ data race (and the stale batch
  // would be published into the new epoch).
  b->epoch_active = false;
  b->cv.wait(lk, [&] { return !b->filling; });
  ++b->generation;
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
              sizeof(float) * b->batch_size * b->out_size);
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
