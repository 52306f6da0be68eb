// mindio — native MIND behaviors/impressions parser for the TPU input
// pipeline.
//
// The reference parses behaviors TSVs with a per-line Python mapper inside
// a torch IterableDataset (dataset.py:26-49); at pod scale the host-side
// parse becomes the feed bottleneck. This library mmaps a prepared
// behaviors shard and emits the dense arrays the batch loader consumes:
//   train:  history (N,L) int32 front-padded, history_mask (N,L) f32,
//           pos (N,) int32, neg (N,K) int32
//   eval:   history (N,L), history_mask (N,L), candidates (N,C) int32,
//           labels (N,C) f32, candidate_mask (N,C) f32
// with the exact reference semantics: unknown doc ids -> 0
// (dataset.py:14-15), keep the most recent L clicks, front-pad with 0
// (dataset.py:17-24).
//
// Zero dependencies; C ABI for ctypes. All buffers are malloc'd here and
// released with mindio_free_result.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <unordered_map>
#include <vector>

namespace {

struct Index {
  std::unordered_map<std::string, int32_t> map;
};

struct View {
  const char* p;
  size_t n;
};

// Split a memory range on a delimiter, calling fn(token_view) per token.
template <typename Fn>
inline void for_each_token(const char* begin, const char* end, char delim,
                           Fn&& fn) {
  const char* tok = begin;
  for (const char* p = begin; p <= end; ++p) {
    if (p == end || *p == delim) {
      if (p > tok) fn(View{tok, static_cast<size_t>(p - tok)});
      tok = p + 1;
    }
  }
}

inline int32_t lookup(const Index* idx, View v) {
  auto it = idx->map.find(std::string(v.p, v.n));
  return it == idx->map.end() ? 0 : it->second;
}

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

MappedFile map_file(const char* path) {
  MappedFile m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0 || st.st_size == 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const char*>(p);
  m.size = st.st_size;
  return m;
}

void unmap_file(MappedFile& m) {
  if (m.data) munmap(const_cast<char*>(m.data), m.size);
  if (m.fd >= 0) close(m.fd);
}

// history field -> front-padded idx row + mask row (reference
// pad_to_fix_len semantics: keep the LAST L entries).
void fill_history(const Index* idx, const char* begin, const char* end,
                  int32_t L, int32_t* hist_row, float* mask_row) {
  std::vector<int32_t> ids;
  ids.reserve(64);
  for_each_token(begin, end, ' ', [&](View v) { ids.push_back(lookup(idx, v)); });
  const int64_t n = static_cast<int64_t>(ids.size());
  const int64_t keep = n < L ? n : L;
  const int64_t pad = L - keep;
  for (int64_t i = 0; i < pad; ++i) {
    hist_row[i] = 0;
    mask_row[i] = 0.0f;
  }
  for (int64_t i = 0; i < keep; ++i) {
    hist_row[pad + i] = ids[n - keep + i];
    mask_row[pad + i] = 1.0f;
  }
}

struct Fields {
  const char* f[8];
  const char* fe[8];
  int count;
};

// Split a line into up to 8 tab fields.
inline Fields split_line(const char* begin, const char* end) {
  Fields out;
  out.count = 0;
  const char* tok = begin;
  for (const char* p = begin; p <= end && out.count < 8; ++p) {
    if (p == end || *p == '\t') {
      out.f[out.count] = tok;
      out.fe[out.count] = p;
      ++out.count;
      tok = p + 1;
    }
  }
  return out;
}

}  // namespace

extern "C" {

// ---- doc-id index --------------------------------------------------------

void* mindio_index_create() { return new Index(); }

void mindio_index_add(void* handle, const char* id, int32_t value) {
  static_cast<Index*>(handle)->map.emplace(id, value);
}

void mindio_index_free(void* handle) { delete static_cast<Index*>(handle); }

// ---- prepared-train-shard parser ----------------------------------------
// File format: iid \t uid \t time \t history \t pos \t "neg1 neg2 ..."
// (prepare_data.py output). Returns row count, or -1 on error.

struct TrainResult {
  int64_t n;
  int32_t* history;      // (n, L)
  float* history_mask;   // (n, L)
  int32_t* pos;          // (n,)
  int32_t* neg;          // (n, K)
};

int64_t mindio_parse_train(void* index_handle, const char* path, int32_t L,
                           int32_t K, TrainResult* out) {
  const Index* idx = static_cast<const Index*>(index_handle);
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;

  // count lines first for exact allocation
  int64_t n_lines = 0;
  for (size_t i = 0; i < m.size; ++i)
    if (m.data[i] == '\n') ++n_lines;
  if (m.size > 0 && m.data[m.size - 1] != '\n') ++n_lines;

  out->n = 0;
  out->history = static_cast<int32_t*>(malloc(sizeof(int32_t) * n_lines * L));
  out->history_mask = static_cast<float*>(malloc(sizeof(float) * n_lines * L));
  out->pos = static_cast<int32_t*>(malloc(sizeof(int32_t) * n_lines));
  out->neg = static_cast<int32_t*>(malloc(sizeof(int32_t) * n_lines * K));

  const char* line = m.data;
  const char* file_end = m.data + m.size;
  while (line < file_end) {
    const char* nl = static_cast<const char*>(
        memchr(line, '\n', file_end - line));
    const char* line_end = nl ? nl : file_end;
    if (line_end > line) {
      Fields f = split_line(line, line_end);
      if (f.count >= 6) {
        const int64_t r = out->n;
        fill_history(idx, f.f[3], f.fe[3], L, out->history + r * L,
                     out->history_mask + r * L);
        // first token of the pos field (one positive per line)
        int32_t pos_id = 0;
        bool got = false;
        for_each_token(f.f[4], f.fe[4], ' ', [&](View v) {
          if (!got) {
            pos_id = lookup(idx, v);
            got = true;
          }
        });
        out->pos[r] = pos_id;
        int32_t k = 0;
        for_each_token(f.f[5], f.fe[5], ' ', [&](View v) {
          if (k < K) out->neg[r * K + k++] = lookup(idx, v);
        });
        for (; k < K; ++k) out->neg[r * K + k] = 0;
        ++out->n;
      }
    }
    if (!nl) break;
    line = nl + 1;
  }
  unmap_file(m);
  return out->n;
}

// ---- raw-eval-shard parser ----------------------------------------------
// File format: iid \t uid \t time \t history \t "Nx-0 Ny-1 ..."
// (raw behaviors.tsv). C = fixed candidate width (0-padded).

struct EvalResult {
  int64_t n;
  int32_t* history;        // (n, L)
  float* history_mask;     // (n, L)
  int32_t* candidates;     // (n, C)
  float* labels;           // (n, C)
  float* candidate_mask;   // (n, C)
  int64_t truncated;       // impressions with more than C candidates
  int64_t max_width;       // widest impression observed (pre-truncation)
};

int64_t mindio_parse_eval(void* index_handle, const char* path, int32_t L,
                          int32_t C, EvalResult* out) {
  const Index* idx = static_cast<const Index*>(index_handle);
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;

  int64_t n_lines = 0;
  for (size_t i = 0; i < m.size; ++i)
    if (m.data[i] == '\n') ++n_lines;
  if (m.size > 0 && m.data[m.size - 1] != '\n') ++n_lines;

  out->n = 0;
  out->truncated = 0;
  out->max_width = 0;
  out->history = static_cast<int32_t*>(malloc(sizeof(int32_t) * n_lines * L));
  out->history_mask = static_cast<float*>(malloc(sizeof(float) * n_lines * L));
  out->candidates =
      static_cast<int32_t*>(calloc(n_lines * C, sizeof(int32_t)));
  out->labels = static_cast<float*>(calloc(n_lines * C, sizeof(float)));
  out->candidate_mask =
      static_cast<float*>(calloc(n_lines * C, sizeof(float)));

  const char* line = m.data;
  const char* file_end = m.data + m.size;
  while (line < file_end) {
    const char* nl = static_cast<const char*>(
        memchr(line, '\n', file_end - line));
    const char* line_end = nl ? nl : file_end;
    if (line_end > line) {
      Fields f = split_line(line, line_end);
      if (f.count >= 5) {
        const int64_t r = out->n;
        fill_history(idx, f.f[3], f.fe[3], L, out->history + r * L,
                     out->history_mask + r * L);
        int32_t c = 0;       // candidates kept (<= C)
        int64_t total = 0;   // candidates present in the line
        for_each_token(f.f[4], f.fe[4], ' ', [&](View v) {
          // split "Nxxxx-0/1" on the LAST '-'
          const char* dash = nullptr;
          for (const char* p = v.p + v.n; p-- > v.p;)
            if (*p == '-') {
              dash = p;
              break;
            }
          if (!dash) return;
          ++total;
          if (c >= C) return;
          out->candidates[r * C + c] =
              lookup(idx, View{v.p, static_cast<size_t>(dash - v.p)});
          out->labels[r * C + c] =
              (dash + 1 < v.p + v.n && dash[1] == '1') ? 1.0f : 0.0f;
          out->candidate_mask[r * C + c] = 1.0f;
          ++c;
        });
        if (total > C) ++out->truncated;
        if (total > out->max_width) out->max_width = total;
        ++out->n;
      }
    }
    if (!nl) break;
    line = nl + 1;
  }
  unmap_file(m);
  return out->n;
}

void mindio_free(void* p) { free(p); }

}  // extern "C"
