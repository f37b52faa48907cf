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

// ---- Porter stemmer (Porter 1980) -----------------------------------------
// The ORIGINAL published algorithm, mirroring vod_tpu/native/porter.py token
// for token (parity-tested). Parity: ES language analyzers stem (reference
// `vod_configs/utils/es_body.py:32` — the English pipeline is
// lowercase -> stop -> porter_stem). ASCII lowercase input only; callers skip
// tokens containing non-ASCII bytes.

inline bool is_cons(const std::string& w, int i) {
  const char c = w[i];
  if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
  if (c == 'y') return i == 0 || !is_cons(w, i - 1);
  return true;
}

inline int measure(const std::string& w, int n) {  // m over w[0:n]
  int m = 0, i = 0;
  while (i < n && is_cons(w, i)) ++i;
  while (i < n) {
    while (i < n && !is_cons(w, i)) ++i;
    if (i >= n) break;
    ++m;
    while (i < n && is_cons(w, i)) ++i;
  }
  return m;
}

inline bool has_vowel(const std::string& w, int n) {
  for (int i = 0; i < n; ++i)
    if (!is_cons(w, i)) return true;
  return false;
}

inline bool ends_double_cons(const std::string& w) {
  const int n = static_cast<int>(w.size());
  return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
}

inline bool ends_cvc(const std::string& w, int n) {  // *o over w[0:n]
  if (n < 3) return false;
  const char last = w[n - 1];
  return is_cons(w, n - 1) && !is_cons(w, n - 2) && is_cons(w, n - 3) &&
         last != 'w' && last != 'x' && last != 'y';
}

inline bool ends_with(const std::string& w, const char* suf) {
  const size_t sl = std::strlen(suf);
  return w.size() >= sl && std::memcmp(w.data() + w.size() - sl, suf, sl) == 0;
}

void porter_stem(std::string& w) {
  if (w.size() <= 2) return;

  // step 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);

  // step 1b
  bool flag_1b = false;
  if (ends_with(w, "eed")) {
    if (measure(w, static_cast<int>(w.size()) - 3) > 0) w.resize(w.size() - 1);
  } else if (ends_with(w, "ed") && has_vowel(w, static_cast<int>(w.size()) - 2)) {
    w.resize(w.size() - 2);
    flag_1b = true;
  } else if (ends_with(w, "ing") && has_vowel(w, static_cast<int>(w.size()) - 3)) {
    w.resize(w.size() - 3);
    flag_1b = true;
  }
  if (flag_1b) {
    if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
      w.push_back('e');
    } else if (ends_double_cons(w) && w.back() != 'l' && w.back() != 's' && w.back() != 'z') {
      w.resize(w.size() - 1);
    } else if (measure(w, static_cast<int>(w.size())) == 1 &&
               ends_cvc(w, static_cast<int>(w.size()))) {
      w.push_back('e');
    }
  }

  // step 1c
  if (ends_with(w, "y") && has_vowel(w, static_cast<int>(w.size()) - 1)) w.back() = 'i';

  // steps 2 and 3: first matching suffix wins; replace iff m(stem) > 0
  struct Rule { const char* suf; const char* rep; };
  static const Rule kStep2[] = {
      {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"}, {"anci", "ance"},
      {"izer", "ize"}, {"abli", "able"}, {"alli", "al"}, {"entli", "ent"},
      {"eli", "e"}, {"ousli", "ous"}, {"ization", "ize"}, {"ation", "ate"},
      {"ator", "ate"}, {"alism", "al"}, {"iveness", "ive"}, {"fulness", "ful"},
      {"ousness", "ous"}, {"aliti", "al"}, {"iviti", "ive"}, {"biliti", "ble"}};
  static const Rule kStep3[] = {
      {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
      {"ical", "ic"}, {"ful", ""}, {"ness", ""}};
  for (const auto& r : kStep2) {
    if (ends_with(w, r.suf)) {
      const int stem_n = static_cast<int>(w.size() - std::strlen(r.suf));
      if (measure(w, stem_n) > 0) { w.resize(stem_n); w.append(r.rep); }
      break;
    }
  }
  for (const auto& r : kStep3) {
    if (ends_with(w, r.suf)) {
      const int stem_n = static_cast<int>(w.size() - std::strlen(r.suf));
      if (measure(w, stem_n) > 0) { w.resize(stem_n); w.append(r.rep); }
      break;
    }
  }

  // step 4: drop iff m(stem) > 1 ("ion" additionally needs stem ending s|t)
  static const char* kStep4[] = {"al", "ance", "ence", "er", "ic", "able",
                                 "ible", "ant", "ement", "ment", "ent", "ion",
                                 "ou", "ism", "ate", "iti", "ous", "ive", "ize"};
  for (const char* suf : kStep4) {
    if (ends_with(w, suf)) {
      const int stem_n = static_cast<int>(w.size() - std::strlen(suf));
      if (measure(w, stem_n) > 1) {
        const bool ion = std::strcmp(suf, "ion") == 0;
        if (!ion || (stem_n > 0 && (w[stem_n - 1] == 's' || w[stem_n - 1] == 't'))) {
          w.resize(stem_n);
        }
      }
      break;
    }
  }

  // step 5a
  if (ends_with(w, "e")) {
    const int n1 = static_cast<int>(w.size()) - 1;
    const int m = measure(w, n1);
    if (m > 1 || (m == 1 && !ends_cvc(w, n1))) w.resize(n1);
  }
  // step 5b
  if (measure(w, static_cast<int>(w.size())) > 1 && ends_double_cons(w) && w.back() == 'l') {
    w.resize(w.size() - 1);
  }
}

inline bool is_ascii(const std::string& w) {
  for (const char c : w)
    if (static_cast<unsigned char>(c) >= 0x80) return false;
  return true;
}

}  // namespace

extern "C" {

// Tokenize one UTF-8 text: lowercase ASCII letters/digits, split on everything
// else, drop tokens shorter than min_len CODEPOINTS (not bytes — parity with
// the Python fallback's len(str)) and (optionally) stopwords, optionally
// Porter-stem ASCII tokens (ES language-analyzer parity), hash each token
// into [0, vocab_size) with FNV-1a (vocab_size must be a power of two).
// Callers must pre-lowercase non-ASCII text host-side (loader.py does) so
// native and fallback paths hash identical ids.
// Writes up to max_terms ids into out_ids; returns the number written.
int analyze_text(const char* text, int32_t* out_ids, int max_terms,
                 int vocab_size, int min_len, int use_stopwords, int use_stemmer) {
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
        // stem AFTER the stopword check (ES pipeline order: stop -> stem)
        if (use_stemmer && is_ascii(token)) porter_stem(token);
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
                   int vocab_size, int min_len, int use_stopwords, int use_stemmer) {
  for (int i = 0; i < n; ++i) {
    out_counts[i] = analyze_text(texts + offsets[i], out_ids + static_cast<int64_t>(i) * max_terms,
                                 max_terms, vocab_size, min_len, use_stopwords, use_stemmer);
  }
}

// Stem one lowercase ASCII token in place (parity testing hook for porter.py).
// Returns the stemmed length; buf must hold at least the input length.
int porter_stem_token(char* buf, int len) {
  std::string w(buf, static_cast<size_t>(len));
  porter_stem(w);
  std::memcpy(buf, w.data(), w.size());
  return static_cast<int>(w.size());
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
