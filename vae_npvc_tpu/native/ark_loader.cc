// Native batch loader for Kaldi float-matrix arks.
//
// Replaces the framework's Python per-item read path (data/dataset.py) for the
// training hot loop: the reference pipeline leans on external Kaldi C++
// binaries plus 8 torch DataLoader worker *processes* (reference:
// vae_npvc/bin/train.py:69-76); here a thread pool inside one process does
// pread()-based windowed reads straight into the caller-provided batch buffer
// (zero copies on the Python side, no GIL involvement during IO).
//
// Scope: uncompressed 'FM' (float32) matrices, the format our own
// make_fbank/apply_cmvn writers emit. Headers are parsed once at open; each
// item read is a single contiguous pread of crop_len rows.
//
// C ABI (ctypes):
//   void* loader_open(const char* feats_scp);           // returns handle/NULL
//   long  loader_num_utts(void*);
//   int   loader_feat_dim(void*);
//   long  loader_num_frames(void*, long idx);
//   int   loader_load_batch(void*, const long* indices, const long* starts,
//                           long n, long crop, float* out, int nthreads);
//   void  loader_close(void*);
//
// loader_load_batch fills out[n, crop, dim]; rows past the utterance end are
// zero (the dataset's zero-pad contract, reference utt2mel_spk.py:68-70).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Item {
  int file_id;
  int64_t data_off;   // byte offset of the float payload
  int32_t rows;
  int32_t cols;
};

struct Loader {
  std::vector<std::string> files;
  std::vector<int> fds;
  std::vector<Item> items;
  int cols = -1;
};

// Parse "path:offset" (no range suffix; ranges are handled by `starts`).
bool split_rx(const std::string& rx, std::string* path, int64_t* off) {
  size_t colon = rx.rfind(':');
  if (colon == std::string::npos || colon == 0) return false;
  const std::string tail = rx.substr(colon + 1);
  if (tail.empty() ||
      tail.find_first_not_of("0123456789") != std::string::npos)
    return false;
  *path = rx.substr(0, colon);
  *off = std::stoll(tail);
  return true;
}

// Read the Kaldi binary FM header at `off`; fill rows/cols/data offset.
bool parse_header(int fd, int64_t off, Item* it) {
  unsigned char buf[16];
  // Full FM header is 15 bytes: \0B 'F''M'' ' \x04 <i32 rows> \x04 <i32 cols>
  if (pread(fd, buf, 15, off) != 15) return false;
  if (buf[0] != 0 || buf[1] != 'B') return false;
  if (buf[2] != 'F' || buf[3] != 'M' || buf[4] != ' ') return false;
  if (buf[5] != 4 || buf[10] != 4) return false;
  int32_t rows, cols;
  std::memcpy(&rows, buf + 6, 4);
  std::memcpy(&cols, buf + 11, 4);
  if (rows < 0 || cols <= 0) return false;
  it->data_off = off + 15;  // 2 flag + 3 token + (1+4)*2 dims
  it->rows = rows;
  it->cols = cols;
  return true;
}

}  // namespace

extern "C" {

void* loader_open(const char* feats_scp) {
  FILE* f = std::fopen(feats_scp, "r");
  if (!f) return nullptr;
  auto* L = new Loader();
  std::unordered_map<std::string, int> file_ids;
  char line[65536];
  while (std::fgets(line, sizeof line, f)) {
    char* sp = std::strchr(line, ' ');
    if (!sp) continue;
    std::string rx(sp + 1);
    while (!rx.empty() && (rx.back() == '\n' || rx.back() == '\r' ||
                           rx.back() == ' '))
      rx.pop_back();
    std::string path;
    int64_t off;
    if (!split_rx(rx, &path, &off)) { delete L; std::fclose(f); return nullptr; }
    auto itf = file_ids.find(path);
    int fid;
    if (itf == file_ids.end()) {
      int fd = open(path.c_str(), O_RDONLY);
      if (fd < 0) { delete L; std::fclose(f); return nullptr; }
      fid = static_cast<int>(L->files.size());
      file_ids.emplace(path, fid);
      L->files.push_back(path);
      L->fds.push_back(fd);
    } else {
      fid = itf->second;
    }
    Item it;
    it.file_id = fid;
    if (!parse_header(L->fds[fid], off, &it)) {
      delete L; std::fclose(f); return nullptr;  // compressed/double: fallback
    }
    if (L->cols < 0) L->cols = it.cols;
    if (it.cols != L->cols) { delete L; std::fclose(f); return nullptr; }
    L->items.push_back(it);
  }
  std::fclose(f);
  if (L->items.empty()) { delete L; return nullptr; }
  return L;
}

long loader_num_utts(void* h) {
  return static_cast<Loader*>(h)->items.size();
}

int loader_feat_dim(void* h) { return static_cast<Loader*>(h)->cols; }

long loader_num_frames(void* h, long idx) {
  auto* L = static_cast<Loader*>(h);
  if (idx < 0 || idx >= (long)L->items.size()) return -1;
  return L->items[idx].rows;
}

int loader_load_batch(void* h, const long* indices, const long* starts,
                      long n, long crop, float* out, int nthreads) {
  auto* L = static_cast<Loader*>(h);
  const long dim = L->cols;
  std::atomic<long> next(0);
  std::atomic<int> err(0);

  auto work = [&]() {
    for (;;) {
      long b = next.fetch_add(1);
      if (b >= n) return;
      long idx = indices[b];
      if (idx < 0 || idx >= (long)L->items.size()) { err = 1; return; }
      const Item& it = L->items[idx];
      long start = starts[b];
      long take = it.rows - start;
      if (take > crop) take = crop;
      if (take < 0) take = 0;  // start past end: whole window zero-padded
      float* dst = out + b * crop * dim;
      if (take < crop)
        std::memset(dst + take * dim, 0, (crop - take) * dim * sizeof(float));
      if (take > 0) {
        ssize_t want = take * dim * sizeof(float);
        ssize_t got = pread(L->fds[it.file_id], dst, want,
                            it.data_off + start * dim * sizeof(float));
        if (got != want) { err = 2; return; }
      }
    }
  };

  if (nthreads <= 1 || n <= 1) {
    work();
  } else {
    std::vector<std::thread> ts;
    int nt = nthreads < n ? nthreads : static_cast<int>(n);
    ts.reserve(nt);
    for (int i = 0; i < nt; ++i) ts.emplace_back(work);
    for (auto& t : ts) t.join();
  }
  return err.load();
}

void loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  for (int fd : L->fds) close(fd);
  delete L;
}

}  // extern "C"
