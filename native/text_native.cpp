// text_native — native host-path runtime for the TPU RAG framework.
//
// The device path is JAX/XLA/Pallas; this library owns the host hot loops
// around it: tokenization, hash featurization (the mock/feature encoder's
// host stage), BM25 corpus statistics, and vocabulary term-id lookup.
// Python binds via ctypes (see a_modular_rag_framework_tpu/native).
//
// Tokenization semantics must match the Python reference exactly:
// lowercase, split on any byte outside [a-zA-Z0-9] (the `[^a-zA-Z0-9]+`
// regex); feature hashing uses zlib crc32 over token bytes, with bigrams
// joined by '_' — identical to models/hash_embed.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <zlib.h>

namespace {

inline bool is_alnum(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
         (c >= '0' && c <= '9');
}

inline char lower(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? static_cast<char>(c - 'A' + 'a')
                                : static_cast<char>(c);
}

// Tokenize into lowercase alnum runs appended to `out`.
void tokenize(const char* text, std::vector<std::string>& out) {
  if (!text) return;
  std::string cur;
  for (const char* p = text; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (is_alnum(c)) {
      cur.push_back(lower(c));
    } else if (!cur.empty()) {
      out.push_back(cur);
      cur.clear();
    }
  }
  if (!cur.empty()) out.push_back(cur);
}

inline uint32_t crc(const std::string& s) {
  return static_cast<uint32_t>(
      crc32(0L, reinterpret_cast<const Bytef*>(s.data()), s.size()));
}

}  // namespace

extern "C" {

// Hash-featurize a batch: unigrams + '_'-joined bigrams, bucket = crc % dim,
// sign = +1/-1 from bit 16 of the crc. buckets/signs are [n, max_features],
// zero-padded. Matches hash_embed.featurize().
void featurize_batch(const char* const* texts, int n, int dim,
                     int max_features, int32_t* buckets, float* signs) {
  std::vector<std::string> toks;
  std::vector<std::string> feats;
  for (int i = 0; i < n; ++i) {
    toks.clear();
    feats.clear();
    tokenize(texts[i], toks);
    feats = toks;
    for (size_t j = 0; j + 1 < toks.size(); ++j) {
      feats.push_back(toks[j] + "_" + toks[j + 1]);
    }
    int32_t* brow = buckets + static_cast<int64_t>(i) * max_features;
    float* srow = signs + static_cast<int64_t>(i) * max_features;
    int m = static_cast<int>(feats.size());
    if (m > max_features) m = max_features;
    for (int j = 0; j < m; ++j) {
      uint32_t h = crc(feats[j]);
      brow[j] = static_cast<int32_t>(h % static_cast<uint32_t>(dim));
      srow[j] = ((h >> 16) & 1u) ? 1.0f : -1.0f;
    }
    for (int j = m; j < max_features; ++j) {
      brow[j] = 0;
      srow[j] = 0.0f;
    }
  }
}

// Count tokens per text (doc_lens for BM25).
void token_counts(const char* const* texts, int n, int32_t* counts) {
  std::vector<std::string> toks;
  for (int i = 0; i < n; ++i) {
    toks.clear();
    tokenize(texts[i], toks);
    counts[i] = static_cast<int32_t>(toks.size());
  }
}

// ---- BM25 corpus build (two-phase: size query, then fill) ----
//
// Builds term postings with per-posting precomputed BM25 contributions,
// sorted contribution-descending within each term (the engine's capacity
// window then keeps the strongest docs). The vocabulary is returned as a
// single '\n'-joined byte blob in first-seen term order (term id = line).

struct Bm25Handle {
  std::unordered_map<std::string, int32_t> vocab;  // term -> id
  std::vector<std::string> terms;                  // id -> term
  std::vector<std::vector<std::pair<int32_t, float>>> postings;  // id -> (doc, tf)
  std::vector<float> doc_lens;
  std::string vocab_blob;
  // flattened (filled by bm25_finalize)
  std::vector<int32_t> doc_ids;
  std::vector<float> tfs;
  std::vector<float> scores;
  std::vector<int32_t> row_ptr;
  std::vector<float> df;
};

void* bm25_create() { return new Bm25Handle(); }

void bm25_destroy(void* h) { delete static_cast<Bm25Handle*>(h); }

// Feed a chunk of documents (streaming-friendly).
void bm25_add_docs(void* hptr, const char* const* texts, int n) {
  auto* h = static_cast<Bm25Handle*>(hptr);
  auto& vm = h->vocab;
  std::vector<std::string> toks;
  std::unordered_map<std::string, int32_t> local_tf;

  std::unordered_map<int32_t, float> tf_by_id;
  std::vector<int32_t> seen_order;
  for (int i = 0; i < n; ++i) {
    toks.clear();
    tokenize(texts[i], toks);
    int32_t doc = static_cast<int32_t>(h->doc_lens.size());
    h->doc_lens.push_back(static_cast<float>(toks.size()));
    // assign vocab ids in token-occurrence order (matches the Python
    // builder's setdefault-per-occurrence id assignment)
    tf_by_id.clear();
    seen_order.clear();
    for (auto& t : toks) {
      auto it = vm.find(t);
      int32_t tid;
      if (it == vm.end()) {
        tid = static_cast<int32_t>(h->terms.size());
        vm.emplace(t, tid);
        h->terms.push_back(t);
        h->postings.emplace_back();
      } else {
        tid = it->second;
      }
      auto ins = tf_by_id.emplace(tid, 0.0f);
      if (ins.second) seen_order.push_back(tid);
      ins.first->second += 1.0f;
    }
    for (int32_t tid : seen_order) {
      h->postings[tid].emplace_back(doc, tf_by_id[tid]);
    }
  }
}

// Compute contributions + flatten. Returns total postings count.
int64_t bm25_finalize(void* hptr, float k1, float b) {
  auto* h = static_cast<Bm25Handle*>(hptr);
  const int64_t n_docs = static_cast<int64_t>(h->doc_lens.size());
  double sum_len = 0;
  for (float l : h->doc_lens) sum_len += l;
  const double avgdl = n_docs ? (sum_len / n_docs) : 1.0;
  const double avg = avgdl > 0 ? avgdl : 1.0;

  const size_t V = h->terms.size();
  h->row_ptr.assign(V + 1, 0);
  h->df.assign(V, 0.0f);
  int64_t total = 0;
  for (size_t t = 0; t < V; ++t) {
    h->df[t] = static_cast<float>(h->postings[t].size());
    total += static_cast<int64_t>(h->postings[t].size());
    h->row_ptr[t + 1] = static_cast<int32_t>(total);
  }
  h->doc_ids.resize(total);
  h->tfs.resize(total);
  h->scores.resize(total);

  std::vector<std::pair<float, std::pair<int32_t, float>>> scored;
  for (size_t t = 0; t < V; ++t) {
    const double dfv = h->df[t];
    const double idf = std::log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0);
    scored.clear();
    scored.reserve(h->postings[t].size());
    for (auto& p : h->postings[t]) {
      const double tf = p.second;
      const double dl = h->doc_lens[p.first];
      double denom = tf + k1 * (1.0 - b + b * dl / avg);
      if (denom == 0) denom = 1.0;
      const float c = static_cast<float>(idf * tf * (k1 + 1.0) / denom);
      scored.emplace_back(c, p);
    }
    std::sort(scored.begin(), scored.end(), [](const auto& a, const auto& b2) {
      if (a.first != b2.first) return a.first > b2.first;
      return a.second.first < b2.second.first;  // doc-ascending tiebreak
    });
    int64_t base = h->row_ptr[t];
    for (size_t j = 0; j < scored.size(); ++j) {
      h->doc_ids[base + j] = scored[j].second.first;
      h->tfs[base + j] = scored[j].second.second;
      h->scores[base + j] = scored[j].first;
    }
  }

  h->vocab_blob.clear();
  for (size_t t = 0; t < V; ++t) {
    h->vocab_blob += h->terms[t];
    h->vocab_blob += '\n';
  }
  return total;
}

int64_t bm25_vocab_size(void* hptr) {
  return static_cast<int64_t>(static_cast<Bm25Handle*>(hptr)->terms.size());
}

int64_t bm25_vocab_blob_size(void* hptr) {
  return static_cast<int64_t>(static_cast<Bm25Handle*>(hptr)->vocab_blob.size());
}

int64_t bm25_n_docs(void* hptr) {
  return static_cast<int64_t>(static_cast<Bm25Handle*>(hptr)->doc_lens.size());
}

// Copy the flattened arrays out (buffers allocated by the caller).
void bm25_export(void* hptr, int32_t* doc_ids, float* tfs, float* scores,
                 int32_t* row_ptr, float* df, float* doc_lens,
                 char* vocab_blob) {
  auto* h = static_cast<Bm25Handle*>(hptr);
  std::memcpy(doc_ids, h->doc_ids.data(), h->doc_ids.size() * sizeof(int32_t));
  std::memcpy(tfs, h->tfs.data(), h->tfs.size() * sizeof(float));
  std::memcpy(scores, h->scores.data(), h->scores.size() * sizeof(float));
  std::memcpy(row_ptr, h->row_ptr.data(), h->row_ptr.size() * sizeof(int32_t));
  std::memcpy(df, h->df.data(), h->df.size() * sizeof(float));
  std::memcpy(doc_lens, h->doc_lens.data(), h->doc_lens.size() * sizeof(float));
  std::memcpy(vocab_blob, h->vocab_blob.data(), h->vocab_blob.size());
}

// ---- vocabulary lookup (query encoding hot path) ----

struct VocabHandle {
  std::unordered_map<std::string, int32_t> map;
};

void* vocab_create(const char* blob, int64_t size) {
  auto* h = new VocabHandle();
  int32_t id = 0;
  const char* p = blob;
  const char* end = blob + size;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    h->map.emplace(std::string(p, nl - p), id++);
    p = nl + 1;
  }
  return h;
}

void vocab_destroy(void* h) { delete static_cast<VocabHandle*>(h); }

// Tokenize each text and emit its term ids (occurrence order, -1 padded to
// max_terms; unknown terms skipped — query-encoding semantics).
void vocab_lookup_batch(void* hptr, const char* const* texts, int n,
                        int max_terms, int32_t* out_ids) {
  auto* h = static_cast<VocabHandle*>(hptr);
  std::vector<std::string> toks;
  for (int i = 0; i < n; ++i) {
    toks.clear();
    tokenize(texts[i], toks);
    int32_t* row = out_ids + static_cast<int64_t>(i) * max_terms;
    int filled = 0;
    for (auto& t : toks) {
      if (filled >= max_terms) break;
      auto it = h->map.find(t);
      if (it != h->map.end()) row[filled++] = it->second;
    }
    for (int j = filled; j < max_terms; ++j) row[j] = -1;
  }
}

}  // extern "C"
