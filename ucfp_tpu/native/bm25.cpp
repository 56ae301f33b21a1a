// Native BM25 engine: postings, corpus stats, and scoring in C++.
//
// The reference's BM25 is native (FST term dict + roaring postings in
// redb, scored in Rust — src/index/embedded/bm25.rs). This is the
// equivalent host engine: per-tenant corpora with term -> postings maps,
// clear-then-reindex upserts, and BM25+ scoring
//   idf = ln((N - n + 0.5) / (n + 0.5) + 1)
//   score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
// with k1 = 1.2, b = 0.75 (bm25.rs:79-80,551). Accumulation runs in
// double in query-term order, matching the Python engine bit for bit so
// either backend produces identical rankings.
//
// C ABI. Term blobs: [u32 n] then n x { u16 len, bytes, u32 tf }.
// Search results are written into caller-provided arrays.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kK1 = 1.2;
constexpr double kB = 0.75;

struct Corpus {
  // term -> postings (doc -> tf). flat_hash semantics via unordered_map.
  std::unordered_map<std::string, std::unordered_map<uint64_t, uint32_t>>
      postings;
  std::unordered_map<uint64_t, uint32_t> doc_lens;
  std::unordered_map<uint64_t, std::vector<std::string>> doc_terms;
  uint64_t total_doc_len = 0;
};

struct TermRef {
  const char* ptr;
  uint16_t len;
  uint32_t tf;
};

// Parse a term blob; returns false on truncation.
bool parse_blob(const uint8_t* blob, uint32_t blob_len,
                std::vector<TermRef>* out) {
  if (blob_len < 4) return false;
  uint32_t n;
  std::memcpy(&n, blob, 4);
  uint32_t off = 4;
  out->reserve(n);
  for (uint32_t i = 0; i < n; i++) {
    if (off + 2 > blob_len) return false;
    uint16_t len;
    std::memcpy(&len, blob + off, 2);
    off += 2;
    if (off + len + 4 > blob_len) return false;
    TermRef t{reinterpret_cast<const char*>(blob + off), len, 0};
    off += len;
    std::memcpy(&t.tf, blob + off, 4);
    off += 4;
    out->push_back(t);
  }
  return true;
}

}  // namespace

extern "C" {

void* ucfp_bm25_new() { return new Corpus(); }

void ucfp_bm25_free(void* h) { delete static_cast<Corpus*>(h); }

void ucfp_bm25_clear(void* h, uint64_t doc) {
  Corpus* c = static_cast<Corpus*>(h);
  auto it = c->doc_terms.find(doc);
  if (it == c->doc_terms.end()) return;
  for (const auto& term : it->second) {
    auto p = c->postings.find(term);
    if (p != c->postings.end()) {
      p->second.erase(doc);
      if (p->second.empty()) c->postings.erase(p);
    }
  }
  c->total_doc_len -= c->doc_lens[doc];
  c->doc_lens.erase(doc);
  c->doc_terms.erase(it);
}

// terms blob: unique terms with tf counts; doc_len = total token count.
int ucfp_bm25_upsert(void* h, uint64_t doc, const uint8_t* blob,
                     uint32_t blob_len, uint32_t doc_len) {
  Corpus* c = static_cast<Corpus*>(h);
  ucfp_bm25_clear(h, doc);
  std::vector<TermRef> terms;
  if (!parse_blob(blob, blob_len, &terms)) return -1;
  if (terms.empty()) return 0;
  auto& dt = c->doc_terms[doc];
  dt.reserve(terms.size());
  for (const auto& t : terms) {
    std::string term(t.ptr, t.len);
    c->postings[term][doc] = t.tf;
    dt.push_back(std::move(term));
  }
  c->doc_lens[doc] = doc_len;
  c->total_doc_len += doc_len;
  return 0;
}

uint64_t ucfp_bm25_doc_count(void* h) {
  return static_cast<Corpus*>(h)->doc_lens.size();
}

uint64_t ucfp_bm25_total_doc_len(void* h) {
  return static_cast<Corpus*>(h)->total_doc_len;
}

uint64_t ucfp_bm25_term_count(void* h) {
  return static_cast<Corpus*>(h)->postings.size();
}

// df of one term (for SimHash-IDF corpus stats).
uint64_t ucfp_bm25_df(void* h, const char* term, uint16_t len) {
  Corpus* c = static_cast<Corpus*>(h);
  auto it = c->postings.find(std::string(term, len));
  return it == c->postings.end() ? 0 : it->second.size();
}

// tf of (term, doc) and the doc's length — for explain recomputation.
uint32_t ucfp_bm25_tf(void* h, const char* term, uint16_t len, uint64_t doc) {
  Corpus* c = static_cast<Corpus*>(h);
  auto it = c->postings.find(std::string(term, len));
  if (it == c->postings.end()) return 0;
  auto d = it->second.find(doc);
  return d == it->second.end() ? 0 : d->second;
}

uint32_t ucfp_bm25_doc_len(void* h, uint64_t doc) {
  Corpus* c = static_cast<Corpus*>(h);
  auto it = c->doc_lens.find(doc);
  return it == c->doc_lens.end() ? 0 : it->second;
}

// Score unique query terms (blob tf fields ignored) and write the top-k
// (doc, score) pairs, ranked by (-score, doc). Returns hit count (<= k),
// or -1 on a malformed blob.
long ucfp_bm25_search(void* h, const uint8_t* blob, uint32_t blob_len,
                      uint32_t k, uint64_t* out_docs, double* out_scores) {
  Corpus* c = static_cast<Corpus*>(h);
  if (c->doc_lens.empty() || k == 0) return 0;
  std::vector<TermRef> terms;
  if (!parse_blob(blob, blob_len, &terms)) return -1;
  const double n_docs = static_cast<double>(c->doc_lens.size());
  const double avgdl = static_cast<double>(c->total_doc_len) / n_docs;

  std::unordered_map<uint64_t, double> scores;
  for (const auto& t : terms) {
    auto it = c->postings.find(std::string(t.ptr, t.len));
    if (it == c->postings.end()) continue;
    const double n_t = static_cast<double>(it->second.size());
    const double idf = std::log((n_docs - n_t + 0.5) / (n_t + 0.5) + 1.0);
    for (const auto& [doc, tf] : it->second) {
      const double dl = static_cast<double>(c->doc_lens[doc]);
      const double denom = tf + kK1 * (1.0 - kB + kB * dl / avgdl);
      scores[doc] += idf * (tf * (kK1 + 1.0)) / denom;
    }
  }
  std::vector<std::pair<uint64_t, double>> ranked(scores.begin(), scores.end());
  const size_t kk = std::min<size_t>(k, ranked.size());
  std::partial_sort(
      ranked.begin(), ranked.begin() + kk, ranked.end(),
      [](const auto& a, const auto& b) {
        if (a.second != b.second) return a.second > b.second;
        return a.first < b.first;
      });
  for (size_t i = 0; i < kk; i++) {
    out_docs[i] = ranked[i].first;
    out_scores[i] = ranked[i].second;
  }
  return static_cast<long>(kk);
}

}  // extern "C"
