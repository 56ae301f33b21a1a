// Native text-signature hot path: ASCII UAX#29 word tokenizer,
// k-shingle XXH3 hashing, and the MinHash mix+min reduction.
//
// Why: the reference's own headline bench fingerprints a 5.6 KiB text
// doc per iteration (/root/reference/benches/end_to_end.rs:24-42) and
// its REPORT claims sub-millisecond text fingerprints (REPORT.md:41).
// The Python pipeline measured 5.3 ms/doc on that workload: the regex
// engine's UAX#29 split (1.8 ms), the per-char strip loop (0.8 ms) and
// the numpy [S,128] mix+min with its multi-MB temporaries (2.1 ms).
// This module replaces the tokenize->shingle->hash->minhash chain with
// one streaming pass for ASCII inputs (the overwhelming common case);
// non-ASCII documents keep the full Unicode path in modality/text.py.
//
// EXACTNESS CONTRACT: the token stream must be byte-identical to
// ucfp_tpu.modality.text.tokenize_words (the `regex` module's (?w)\b
// word segmentation), and signatures byte-identical to
// ops/textsig.minhash_signature. tests/test_textsig_native.py fuzzes
// both equalities; tests/goldens pin the wire bytes.
//
// UAX#29 word-boundary rules restricted to ASCII (no Extend/Format/ZWJ
// /Hebrew/Katakana/RI below U+0080), as implemented by the `regex`
// engine (probed + fuzz-pinned):
//   classes  ALetter  a-z A-Z
//            Numeric  0-9
//            ExtendNumLet  _
//            MidLetter     :          (joins letter . letter)
//            MidNumLet     .          (letters and digits)
//            Single_Quote  '          (letters via WB6/7, digits via
//                                      WB11/12, and WB5a below)
//            MidNum        , ;        (joins digit . digit)
//   WB5/8/9/10/13a/13b: [a-z0-9_] runs never break internally.
//   WB6/7:   letter  [:.']  letter   -> no break (one mid char only).
//   WB11/12: digit   [,;.'] digit    -> no break.
//   WB5a (the standard's French-elision customization, which the
//   `regex` engine applies): apostrophe binds FORWARD onto a vowel —
//   ' x vowel starts/extends a token ("l'objectif", "'a" -> ["'a"],
//   "'z" -> ["z"]; vowels are exactly aeiouAEIOU, probed).
// A token is a maximal such span containing at least one word char
// (the \w filter in tokenize_words); every token contains one by
// construction except a WB5a quote, which is always followed by one.
//
// XXH3 comes from pyarrow's vendored xxhash (0.8.3) header, inlined;
// equality with the Python `xxhash` module is asserted in tests.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>

#define XXH_INLINE_ALL
#include "arrow/vendored/xxhash/xxhash.h"

namespace {

inline bool is_letter(uint8_t c) {
  return (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z');
}
inline bool is_digit(uint8_t c) { return c >= '0' && c <= '9'; }
inline bool is_word(uint8_t c) {
  return is_letter(c) || is_digit(c) || c == '_';
}
inline bool is_vowel(uint8_t c) {
  switch (c) {
    case 'a': case 'e': case 'i': case 'o': case 'u':
    case 'A': case 'E': case 'I': case 'O': case 'U':
      return true;
    default:
      return false;
  }
}
inline bool mid_letter_join(uint8_t c) {
  return c == ':' || c == '.' || c == '\'';
}
inline bool mid_num_join(uint8_t c) {
  return c == ',' || c == ';' || c == '.' || c == '\'';
}

// Scan one token starting at text[i] (caller guarantees is_word(text[i])
// or a WB5a apostrophe-vowel). Returns the end offset (exclusive).
inline int64_t scan_token(const uint8_t* text, int64_t len, int64_t i) {
  if (text[i] == '\'') ++i;  // WB5a: leading quote, vowel follows
  while (i < len) {
    uint8_t c = text[i];
    if (is_word(c)) {
      ++i;
      continue;
    }
    // candidate mid join: one mid char with matching classes both sides
    if (i + 1 < len) {
      uint8_t prev = text[i - 1], next = text[i + 1];
      if (is_letter(prev) && is_letter(next) && mid_letter_join(c)) {
        i += 2;
        continue;
      }
      if (is_digit(prev) && is_digit(next) && mid_num_join(c)) {
        i += 2;
        continue;
      }
    }
    break;
  }
  return i;
}

// Stafford mix13 (the splitmix64 output mix) — must match
// ops/textsig._mix64_arr bit for bit.
inline uint64_t mix64(uint64_t z) {
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

}  // namespace

extern "C" {

// Tokenize ASCII text into [start, end) span pairs. Returns the token
// count, -1 if a non-ASCII byte is found (caller must fall back to the
// Unicode path), or -2 if cap (in spans, i.e. pairs) is exceeded.
int64_t ucfp_text_tokens(const uint8_t* text, int64_t len,
                         int64_t* spans, int64_t cap) {
  int64_t n = 0;
  for (int64_t i = 0; i < len;) {
    uint8_t c = text[i];
    if (c >= 0x80) return -1;
    bool starts = is_word(c) ||
                  (c == '\'' && i + 1 < len && is_vowel(text[i + 1]));
    if (!starts) {
      ++i;
      continue;
    }
    int64_t end = scan_token(text, len, i);
    // the span may still hold non-ASCII further in? no: scan_token only
    // consumes ASCII word/mid chars, so verify nothing — but bytes
    // AFTER the token are checked by the outer loop as i advances.
    if (n >= cap) return -2;
    spans[2 * n] = i;
    spans[2 * n + 1] = end;
    ++n;
    i = end;
  }
  return n;
}

// out[j] = min over s of mix64(base[s] ^ keys[j]). out must be
// pre-sized to h; it is fully overwritten. Exactly the numpy
// _mix64_arr(base[:,None]^keys[None,:]).min(axis=0) reduction, single
// pass, no temporaries.
void ucfp_minhash_mix_min(const uint64_t* base, int64_t s,
                          const uint64_t* keys, int32_t h, uint64_t* out) {
  for (int32_t j = 0; j < h; ++j) out[j] = UINT64_MAX;
  for (int64_t i = 0; i < s; ++i) {
    uint64_t b = base[i];
    for (int32_t j = 0; j < h; ++j) {
      uint64_t v = mix64(b ^ keys[j]);
      if (v < out[j]) out[j] = v;
    }
  }
}

// Fused hot path: tokenize (ASCII UAX#29) -> k-shingle (tokens joined
// by single spaces; fewer than k tokens yields ONE shingle of all
// tokens, matching modality/text.shingles_of) -> XXH3-64 per shingle
// -> streaming MinHash mix+min into out_sig[h].
// Returns the shingle count (0 = no tokens; caller raises the same
// "no tokens" error as the Python path), or -1 on a non-ASCII byte
// (caller falls back; out_sig contents are then unspecified).
int64_t ucfp_text_minhash_sig(const uint8_t* text, int64_t len, int32_t k,
                              const uint64_t* keys, int32_t h,
                              uint64_t* out_sig) {
  for (int32_t j = 0; j < h; ++j) out_sig[j] = UINT64_MAX;

  // token spans, inline ring of the last k (shingles need a window)
  // — but "fewer than k tokens -> one shingle of all" needs the FULL
  // token list when short, so collect spans first (<= len/1 pairs;
  // tokens are non-overlapping so <= (len+1)/2 of them).
  // A 5.6 KiB doc has ~1.1 k tokens: a small stack-ish buffer suffices,
  // heap-allocate defensively for big docs.
  std::string scratch;
  scratch.reserve(256);
  // tokens are non-overlapping and at least one char wide with at
  // least one separator between them, so (len+1)/2 bounds the count
  const int64_t max_tokens = len / 2 + 1;
  int64_t* spans = new int64_t[2 * (size_t)max_tokens];
  int64_t t = ucfp_text_tokens(text, len, spans, max_tokens);
  if (t < 0) {
    delete[] spans;
    return -1;  // non-ASCII (cap can't hit: max_tokens >= any count)
  }
  if (t == 0) {
    delete[] spans;
    return 0;
  }

  const int64_t nsh = t < k ? 1 : t - k + 1;
  const int64_t width = t < k ? t : k;
  for (int64_t s0 = 0; s0 < nsh; ++s0) {
    scratch.clear();
    for (int64_t j = 0; j < width; ++j) {
      if (j) scratch.push_back(' ');
      const int64_t a = spans[2 * (s0 + j)], b = spans[2 * (s0 + j) + 1];
      scratch.append(reinterpret_cast<const char*>(text) + a, (size_t)(b - a));
    }
    const uint64_t base = XXH3_64bits(scratch.data(), scratch.size());
    for (int32_t j = 0; j < h; ++j) {
      const uint64_t v = mix64(base ^ keys[j]);
      if (v < out_sig[j]) out_sig[j] = v;
    }
  }
  delete[] spans;
  return nsh;
}

// TF-weighted 64-bit SimHash over the ASCII tokenizer's token stream.
// Byte-identical to ops/textsig.simhash64(terms, tf-weights): summing
// +/-tf per UNIQUE term equals summing +/-1 per OCCURRENCE, and the
// Python float accumulation is exact for integral weights, so int64
// accumulators match it bit for bit. Returns 1 ok (*out set), 0 no
// tokens, -1 non-ASCII byte (caller falls back).
int ucfp_text_simhash64_tf(const uint8_t* text, int64_t len, uint64_t* out) {
  int64_t acc[64] = {0};
  bool any = false;
  for (int64_t i = 0; i < len;) {
    uint8_t c = text[i];
    if (c >= 0x80) return -1;
    bool starts = is_word(c) ||
                  (c == '\'' && i + 1 < len && is_vowel(text[i + 1]));
    if (!starts) {
      ++i;
      continue;
    }
    const int64_t end = scan_token(text, len, i);
    const uint64_t h = XXH3_64bits(text + i, (size_t)(end - i));
    for (int b = 0; b < 64; ++b) acc[b] += ((h >> b) & 1) ? 1 : -1;
    any = true;
    i = end;
  }
  if (!any) return 0;
  uint64_t sig = 0;
  for (int b = 0; b < 64; ++b)
    if (acc[b] > 0) sig |= (uint64_t)1 << b;
  *out = sig;
  return 1;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// TLSH 128/1 (Oliver et al. 2013, published algorithm): the Python
// implementation in ops/textsig.py is the semantic source of truth —
// this is a byte-identical port (fuzz-pinned) of its per-byte loop,
// which costs ~6.5 ms/doc in CPython. The Pearson permutation table is
// passed in from Python so the published constant lives in ONE place.
// ---------------------------------------------------------------------------

namespace {

inline uint8_t b_mapping(const uint8_t* p, uint8_t salt, uint8_t i,
                         uint8_t j, uint8_t k) {
  uint8_t t = p[salt];
  t = p[t ^ i];
  t = p[t ^ j];
  return p[t ^ k];
}

// Logarithmic length bucket (TLSH l_capturing). Double math mirrors
// Python's math.log / float division exactly (same libm, no FMA:
// builds use -ffp-contract=off).
inline int l_capturing(int64_t length) {
  if (length <= 0) return 0;
  double x;
  if (length <= 656) {
    x = std::log((double)length) / std::log(1.5);
  } else if (length <= 3199) {
    x = std::log((double)length) / std::log(1.3) - 8.72777;
  } else {
    x = std::log((double)length) / std::log(1.1) - 62.5472;
  }
  int v = (int)x;  // trunc, like Python int()
  if (v < 0) v = 0;
  if (v > 255) v = 255;
  return v;
}

inline uint8_t swap_nibbles(uint8_t b) {
  return (uint8_t)(((b & 0x0F) << 4) | ((b & 0xF0) >> 4));
}

}  // namespace

extern "C" {

// TLSH 128-bucket / 1-byte-checksum digest. Writes 70 lowercase hex
// chars (NOT NUL-terminated) to out. Returns 0 ok, -1 input shorter
// than min_len, -2 insufficient variation (q3 == 0).
int ucfp_tlsh_128_1(const uint8_t* data, int64_t n, int64_t min_len,
                    const uint8_t* pearson, char* out) {
  if (n < min_len) return -1;
  uint32_t buckets[256];
  std::memset(buckets, 0, sizeof(buckets));
  uint8_t checksum = 0;
  for (int64_t i = 4; i < n; ++i) {
    const uint8_t b0 = data[i], b1 = data[i - 1], b2 = data[i - 2],
                  b3 = data[i - 3], b4 = data[i - 4];
    checksum = b_mapping(pearson, 0, b0, b1, checksum);
    ++buckets[b_mapping(pearson, 2, b0, b1, b2)];
    ++buckets[b_mapping(pearson, 3, b0, b1, b3)];
    ++buckets[b_mapping(pearson, 5, b0, b2, b3)];
    ++buckets[b_mapping(pearson, 7, b0, b2, b4)];
    ++buckets[b_mapping(pearson, 11, b0, b1, b4)];
    ++buckets[b_mapping(pearson, 13, b0, b3, b4)];
  }
  // quartiles over the first 128 buckets
  uint32_t sorted_b[128];
  std::memcpy(sorted_b, buckets, sizeof(sorted_b));
  std::sort(sorted_b, sorted_b + 128);
  const uint32_t q1 = sorted_b[31], q2 = sorted_b[63], q3 = sorted_b[95];
  if (q3 == 0) return -2;
  const int lvalue = l_capturing(n);
  const uint32_t q1ratio = (uint32_t)(((uint64_t)q1 * 100 / q3) % 16);
  const uint32_t q2ratio = (uint32_t)(((uint64_t)q2 * 100 / q3) % 16);
  uint8_t digest[35];
  digest[0] = swap_nibbles(checksum);
  digest[1] = swap_nibbles((uint8_t)lvalue);
  digest[2] = swap_nibbles((uint8_t)((q1ratio << 4) | q2ratio));
  for (int i = 0; i < 32; ++i) {
    uint8_t sextet = 0;
    for (int j = 0; j < 4; ++j) {
      const uint32_t k = buckets[(31 - i) * 4 + j];
      uint8_t code;
      if (k <= q1) code = 0;
      else if (k <= q2) code = 1;
      else if (k <= q3) code = 2;
      else code = 3;
      sextet |= (uint8_t)(code << (j * 2));
    }
    digest[3 + i] = sextet;
  }
  static const char* hexd = "0123456789abcdef";
  for (int i = 0; i < 35; ++i) {
    out[2 * i] = hexd[digest[i] >> 4];
    out[2 * i + 1] = hexd[digest[i] & 0x0F];
  }
  return 0;
}

}  // extern "C"
