// Native latent-batch loader: mmap'd .npy posterior arrays + background
// prefetch threads.
//
// The reference feeds training through torch DataLoader worker subprocesses
// (train.py:31, num_workers=4) that sample VAE posteriors in Python. In this
// framework the posterior draw happens on-device inside the jitted train
// step; what remains on the host is index shuffling + row gather + staging,
// which this library runs off the main thread so jax dispatch never waits
// on IO. Exposed through a C API consumed via ctypes
// (mapdit_tpu/training/native_loader.py); a pure-Python fallback exists.
//
// Build: tools/build_native.sh  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// Minimal .npy v1/v2 reader: returns data pointer (mmap), element count per
// row, and row count. Supports C-contiguous little-endian arrays.
struct NpyArray {
  void* map_base = nullptr;
  size_t map_len = 0;
  const uint8_t* data = nullptr;
  size_t rows = 0;
  size_t row_elems = 1;  // product of non-leading dims
  size_t elem_size = 0;
  char kind = 0;  // 'f' or 'i' or 'u'

  bool ok() const { return data != nullptr; }
};

bool parse_header(const std::string& header, NpyArray* out) {
  // header like: {'descr': '<f4', 'fortran_order': False, 'shape': (64, 4, 16, 16), }
  auto find_val = [&](const char* key) -> std::string {
    auto pos = header.find(key);
    if (pos == std::string::npos) return "";
    pos = header.find(':', pos);
    auto end = header.find(',', pos);
    // shape tuple contains commas; handle separately
    return header.substr(pos + 1, end - pos - 1);
  };
  auto descr_pos = header.find("'descr'");
  if (descr_pos == std::string::npos) return false;
  auto q1 = header.find('\'', header.find(':', descr_pos));
  auto q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|')) return false;
  out->kind = descr[1];
  out->elem_size = std::stoul(descr.substr(2));

  if (header.find("'fortran_order': False") == std::string::npos) return false;

  auto sp = header.find("'shape'");
  auto l = header.find('(', sp);
  auto r = header.find(')', l);
  std::string shape = header.substr(l + 1, r - l - 1);
  std::vector<size_t> dims;
  size_t start = 0;
  while (start < shape.size()) {
    auto comma = shape.find(',', start);
    std::string tok = shape.substr(start, comma == std::string::npos ? std::string::npos
                                                                     : comma - start);
    // trim
    size_t a = tok.find_first_not_of(" \t");
    if (a != std::string::npos) {
      size_t b = tok.find_last_not_of(" \t");
      tok = tok.substr(a, b - a + 1);
      if (!tok.empty()) dims.push_back(std::stoul(tok));
    }
    if (comma == std::string::npos) break;
    start = comma + 1;
  }
  if (dims.empty()) return false;
  out->rows = dims[0];
  out->row_elems = 1;
  for (size_t i = 1; i < dims.size(); ++i) out->row_elems *= dims[i];
  return true;
}

bool npy_open(const std::string& path, NpyArray* out) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (base == MAP_FAILED) return false;
  const uint8_t* p = static_cast<const uint8_t*>(base);
  if (st.st_size < 10 || memcmp(p, "\x93NUMPY", 6) != 0) {
    munmap(base, st.st_size);
    return false;
  }
  uint8_t major = p[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = p[8] | (p[9] << 8);
    header_off = 10;
  } else {
    header_len = p[8] | (p[9] << 8) | (p[10] << 16) | (static_cast<size_t>(p[11]) << 24);
    header_off = 12;
  }
  std::string header(reinterpret_cast<const char*>(p + header_off), header_len);
  if (!parse_header(header, out)) {
    munmap(base, st.st_size);
    return false;
  }
  out->map_base = base;
  out->map_len = st.st_size;
  out->data = p + header_off + header_len;
  return true;
}

struct Batch {
  std::vector<float> mean;
  std::vector<float> std;
  std::vector<int32_t> labels;
};

struct Loader {
  NpyArray means, stds, labels;
  size_t batch_size = 0;  // GLOBAL batch (permutation stride)
  size_t local_b = 0;     // rows this process owns per global batch
  size_t proc_lo = 0;     // first owned row within each global batch
  size_t n = 0;
  size_t feat = 0;

  // Reorder buffer keyed by batch sequence number: with >1 prefetch
  // threads, gathers complete out of order, but consumers MUST see batches
  // in permutation order — the multi-host contract (every process's step-s
  // slice comes from the same global batch s) and start_step resume both
  // depend on it. Workers admit a batch only while its seq is inside the
  // [next_emit, next_emit + queue_depth) window, so the lowest outstanding
  // seq always fits and the pipeline can't deadlock.
  std::map<uint64_t, Batch> queue;
  uint64_t next_emit = 0;
  size_t queue_depth = 4;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  // epoch permutation state (guarded by perm_mu)
  std::mutex perm_mu;
  std::vector<uint32_t> perm;
  size_t cursor = 0;
  uint64_t seq_counter = 0;
  std::mt19937_64 rng;

  void refill_perm() {
    if (perm.empty()) {
      perm.resize(n);
      for (size_t i = 0; i < n; ++i) perm[i] = static_cast<uint32_t>(i);
    }
    for (size_t i = n - 1; i > 0; --i) {
      size_t j = rng() % (i + 1);
      std::swap(perm[i], perm[j]);
    }
    cursor = 0;
  }

  // Take this process's slice of the next global batch, reshuffling per
  // epoch (drop_last semantics). All processes seed the same permutation
  // stream and own disjoint row ranges of every global batch — exact
  // coverage, no duplication (the distributed-sampler pattern). The
  // returned seq is the batch's position in the permutation order.
  std::vector<uint32_t> next_indices(uint64_t* seq) {
    std::lock_guard<std::mutex> g(perm_mu);
    if (cursor + batch_size > n) refill_perm();
    auto lo = perm.begin() + cursor + proc_lo;
    std::vector<uint32_t> idx(lo, lo + local_b);
    cursor += batch_size;
    *seq = seq_counter++;
    std::sort(idx.begin(), idx.end());  // mmap gather locality
    return idx;
  }

  template <typename T>
  static float load_as_float(const uint8_t* base, size_t elem_size, size_t i) {
    T v;
    memcpy(&v, base + i * elem_size, sizeof(T));
    return static_cast<float>(v);
  }

  void gather(const std::vector<uint32_t>& idx, Batch* b) {
    b->mean.resize(local_b * feat);
    b->std.resize(local_b * feat);
    b->labels.resize(local_b);
    const float* mp = reinterpret_cast<const float*>(means.data);
    const float* sp = reinterpret_cast<const float*>(stds.data);
    for (size_t r = 0; r < idx.size(); ++r) {
      memcpy(&b->mean[r * feat], mp + static_cast<size_t>(idx[r]) * feat,
             feat * sizeof(float));
      memcpy(&b->std[r * feat], sp + static_cast<size_t>(idx[r]) * feat,
             feat * sizeof(float));
      size_t i = idx[r];
      if (labels.kind == 'i' && labels.elem_size == 8)
        b->labels[r] = static_cast<int32_t>(load_as_float<int64_t>(labels.data, 8, i));
      else if (labels.kind == 'i' && labels.elem_size == 4)
        b->labels[r] = static_cast<int32_t>(load_as_float<int32_t>(labels.data, 4, i));
      else
        b->labels[r] = static_cast<int32_t>(load_as_float<int64_t>(labels.data, 8, i));
    }
  }

  void worker_loop() {
    while (!stop.load()) {
      Batch b;
      uint64_t seq;
      gather(next_indices(&seq), &b);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] {
        return stop.load() || seq < next_emit + queue_depth;
      });
      if (stop.load()) return;
      queue.emplace(seq, std::move(b));
      cv_pop.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// batch_size is the GLOBAL batch; the loader yields the
// batch_size/process_count rows owned by process_index. start_step
// deterministically fast-forwards the shuffle stream (data-cursor resume).
void* ll_open(const char* dir, uint64_t batch_size, uint64_t seed,
              uint64_t queue_depth, uint64_t num_threads,
              uint64_t process_index, uint64_t process_count,
              uint64_t start_step) {
  auto* ld = new Loader();
  std::string d(dir);
  if (process_count == 0) process_count = 1;
  if (!npy_open(d + "/posterior_means.npy", &ld->means) ||
      !npy_open(d + "/posterior_stds.npy", &ld->stds) ||
      !npy_open(d + "/labels.npy", &ld->labels) ||
      ld->means.kind != 'f' || ld->means.elem_size != 4 ||
      ld->stds.kind != 'f' || ld->stds.elem_size != 4 ||
      ld->means.rows != ld->stds.rows || ld->means.rows != ld->labels.rows ||
      batch_size == 0 || ld->means.rows < batch_size ||
      batch_size % process_count != 0 || process_index >= process_count) {
    delete ld;
    return nullptr;
  }
  ld->batch_size = batch_size;
  ld->local_b = batch_size / process_count;
  ld->proc_lo = process_index * ld->local_b;
  ld->n = ld->means.rows;
  ld->feat = ld->means.row_elems;
  ld->queue_depth = queue_depth ? queue_depth : 4;
  ld->rng.seed(seed);
  // A fresh loader at epoch k has applied refill_perm k+1 times; replay
  // that count, then place the cursor mid-epoch.
  size_t steps_per_epoch = ld->n / batch_size;
  for (uint64_t e = 0; e <= start_step / steps_per_epoch; ++e) ld->refill_perm();
  ld->cursor = (start_step % steps_per_epoch) * batch_size;
  uint64_t threads = num_threads ? num_threads : 1;
  for (uint64_t i = 0; i < threads; ++i)
    ld->workers.emplace_back([ld] { ld->worker_loop(); });
  return ld;
}

uint64_t ll_feature_size(void* handle) {
  return static_cast<Loader*>(handle)->feat;
}

uint64_t ll_num_examples(void* handle) {
  return static_cast<Loader*>(handle)->n;
}

// Blocks until a prefetched batch is available, then copies into the
// caller's buffers (mean/std: local_b*feat floats; labels: local_b int32,
// where local_b = batch_size / process_count).
int ll_next(void* handle, float* mean_out, float* std_out, int32_t* labels_out) {
  auto* ld = static_cast<Loader*>(handle);
  Batch b;
  {
    std::unique_lock<std::mutex> lk(ld->mu);
    // emit strictly in permutation order (reorder buffer)
    ld->cv_pop.wait(lk, [&] {
      return ld->stop.load() || ld->queue.count(ld->next_emit) > 0;
    });
    if (ld->stop.load()) return -1;
    auto it = ld->queue.find(ld->next_emit);
    b = std::move(it->second);
    ld->queue.erase(it);
    ld->next_emit++;
    ld->cv_push.notify_all();
  }
  memcpy(mean_out, b.mean.data(), b.mean.size() * sizeof(float));
  memcpy(std_out, b.std.data(), b.std.size() * sizeof(float));
  memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(int32_t));
  return 0;
}

void ll_close(void* handle) {
  auto* ld = static_cast<Loader*>(handle);
  ld->stop.store(true);
  ld->cv_push.notify_all();
  ld->cv_pop.notify_all();
  for (auto& t : ld->workers) t.join();
  for (NpyArray* a : {&ld->means, &ld->stds, &ld->labels})
    if (a->map_base) munmap(a->map_base, a->map_len);
  delete ld;
}

}  // extern "C"
