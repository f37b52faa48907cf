// Text analyzer + BM25 postings builder (native host-side hot path).
//
// Replaces the analysis/indexing work the reference delegates to
// Elasticsearch's Java analyzers (reference `vod_configs/utils/es_body.py`:
// lowercase, stopword filtering, language analyzers) and its bulk-indexing
// pipeline (`es_search/client.py:335`). Corpus analysis and postings
// construction are O(total tokens) and run once per corpus (and once per
// rebuild), so they live in C++; scoring runs on-device (vod_tpu/search/sparse).
//
// Exposed via a C ABI for ctypes (no pybind11 in this image):
//   analyze_batch  : texts -> hashed term ids (FNV-1a into a power-of-two space)
//   build_postings : per-doc term ids -> impact-ordered truncated BM25 postings
//
// Build: g++ -O3 -march=native -shared -fPIC analyzer.cpp -o libvodanalyzer.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 1469598103934665603ull;
constexpr uint64_t kFnvPrime = 1099511628211ull;

inline uint64_t fnv1a(const char* data, size_t n) {
  uint64_t h = kFnvOffset;
  for (size_t i = 0; i < n; ++i) {
    h ^= static_cast<unsigned char>(data[i]);
    h *= kFnvPrime;
  }
  return h;
}

// Minimal English stopword list (parity: ES `_english_` stop filter).
const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string>* kSet = new std::unordered_set<std::string>{
      "a",    "an",   "and",  "are",  "as",   "at",   "be",   "but",  "by",
      "for",  "if",   "in",   "into", "is",   "it",   "no",   "not",  "of",
      "on",   "or",   "such", "that", "the",  "their", "then", "there", "these",
      "they", "this", "to",   "was",  "will", "with"};
  return *kSet;
}

}  // namespace

extern "C" {

// Tokenize one UTF-8 text: lowercase ASCII letters/digits, split on everything
// else, drop tokens shorter than min_len CODEPOINTS (not bytes — parity with
// the Python fallback's len(str)) and (optionally) stopwords, hash each token
// into [0, vocab_size) with FNV-1a (vocab_size must be a power of two).
// Callers must pre-lowercase non-ASCII text host-side (loader.py does) so
// native and fallback paths hash identical ids.
// Writes up to max_terms ids into out_ids; returns the number written.
int analyze_text(const char* text, int32_t* out_ids, int max_terms,
                 int vocab_size, int min_len, int use_stopwords) {
  if (text == nullptr || max_terms <= 0) return 0;
  const uint64_t mask = static_cast<uint64_t>(vocab_size - 1);
  int count = 0;
  int token_cp = 0;  // codepoints in the current token
  std::string token;
  token.reserve(32);
  for (const char* p = text;; ++p) {
    const char c = *p;
    const bool alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
                       (c >= '0' && c <= '9') ||
                       static_cast<unsigned char>(c) >= 0x80;  // keep utf8 bytes
    if (alnum) {
      // UTF-8 continuation bytes (10xxxxxx) don't start a codepoint
      if ((static_cast<unsigned char>(c) & 0xC0) != 0x80) ++token_cp;
      token.push_back((c >= 'A' && c <= 'Z') ? static_cast<char>(c + 32) : c);
    } else {
      if (token_cp >= min_len &&
          (!use_stopwords || stopwords().count(token) == 0)) {
        out_ids[count++] = static_cast<int32_t>(fnv1a(token.data(), token.size()) & mask);
        if (count >= max_terms) return count;
      }
      token.clear();
      token_cp = 0;
      if (c == '\0') break;
    }
    if (c == '\0') break;
  }
  return count;
}

// Batched analysis: `texts` are n zero-terminated strings concatenated;
// `offsets[i]` is the byte offset of text i (offsets[n] = total length).
// Output layout: out_ids is [n, max_terms]; out_counts[i] = #terms of text i.
void analyze_batch(const char* texts, const int64_t* offsets, int n,
                   int32_t* out_ids, int32_t* out_counts, int max_terms,
                   int vocab_size, int min_len, int use_stopwords) {
  for (int i = 0; i < n; ++i) {
    out_counts[i] = analyze_text(texts + offsets[i], out_ids + static_cast<int64_t>(i) * max_terms,
                                 max_terms, vocab_size, min_len, use_stopwords);
  }
}

// Build impact-ordered truncated BM25 postings.
//   term_ids [total]  : concatenated per-doc term ids
//   doc_offsets [n+1] : CSR offsets into term_ids
//   out_docs  [n_terms, max_postings] (pre-filled with -1)
//   out_imps  [n_terms, max_postings] (pre-filled with 0)
// BM25: idf = ln(1 + (N - df + .5)/(df + .5)); impact = idf*tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
void build_postings(const int32_t* term_ids, const int64_t* doc_offsets, int n_docs,
                    int n_terms, int max_postings, float k1, float b,
                    int32_t* out_docs, float* out_imps) {
  // document lengths + average
  double total_len = 0;
  std::vector<int32_t> doc_len(n_docs);
  for (int d = 0; d < n_docs; ++d) {
    doc_len[d] = static_cast<int32_t>(doc_offsets[d + 1] - doc_offsets[d]);
    total_len += doc_len[d];
  }
  const double avgdl = n_docs > 0 ? std::max(total_len / n_docs, 1.0) : 1.0;

  // postings as per-term vectors of (doc, tf)
  std::vector<std::vector<std::pair<int32_t, int32_t>>> postings(n_terms);
  {
    std::unordered_map<int32_t, int32_t> tf;
    for (int d = 0; d < n_docs; ++d) {
      tf.clear();
      for (int64_t j = doc_offsets[d]; j < doc_offsets[d + 1]; ++j) {
        const int32_t t = term_ids[j];
        if (t >= 0 && t < n_terms) ++tf[t];
      }
      for (const auto& kv : tf) {
        postings[kv.first].emplace_back(d, kv.second);
      }
    }
  }

  std::vector<std::pair<float, int32_t>> scored;
  for (int t = 0; t < n_terms; ++t) {
    auto& plist = postings[t];
    if (plist.empty()) continue;
    const double df = static_cast<double>(plist.size());
    const double idf = std::log(1.0 + (n_docs - df + 0.5) / (df + 0.5));
    scored.clear();
    scored.reserve(plist.size());
    for (const auto& dt : plist) {
      const double tf = dt.second;
      const double norm = tf + k1 * (1.0 - b + b * doc_len[dt.first] / avgdl);
      scored.emplace_back(static_cast<float>(idf * tf * (k1 + 1.0) / norm), dt.first);
    }
    const int keep = std::min<int>(max_postings, static_cast<int>(scored.size()));
    std::partial_sort(scored.begin(), scored.begin() + keep, scored.end(),
                      [](const auto& a, const auto& b2) { return a.first > b2.first; });
    int32_t* docs_row = out_docs + static_cast<int64_t>(t) * max_postings;
    float* imps_row = out_imps + static_cast<int64_t>(t) * max_postings;
    for (int j = 0; j < keep; ++j) {
      docs_row[j] = scored[j].second;
      imps_row[j] = scored[j].first;
    }
  }
}

}  // extern "C"
