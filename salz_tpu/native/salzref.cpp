// salzref.cpp - fast scalar C++ oracle for the salz stream format.
//
// Independent implementation of FORMAT.md (derived from studying
// /root/reference/lib/salz.c; see FORMAT.md for rule-by-rule citations).
// Structure mirrors salz_tpu/oracle/pycodec.py stage functions:
//   suffix_array (Manber-Myers radix doubling; SA is unique so this matches
//   any correct construction, including the reference's SA-IS), psv/nsv stack
//   scan, seeded-LCP factorization, backward cost DP, interleaved bit/byte
//   emission, and the scalar decoder.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kTailReserve = 8;
constexpr int kFactorOffsetMin = 1;
constexpr int kFactorLengthMin = 3;

constexpr uint64_t kVnibbleThresholds[11] = {
    8ull, 72ull, 584ull, 4680ull, 37448ull, 299592ull, 2396744ull,
    19173960ull, 153391688ull, 1227133512ull, 9817068104ull};

inline int vnibble_size(uint32_t val) {
  for (int m = 1; m <= 10; m++)
    if (val < kVnibbleThresholds[m - 1]) return m;
  return 11;
}

// MSB-first nibble pattern: base-8 digits of (val - bias), terminator |= 8.
inline uint64_t encode_vnibble(uint32_t val, int* nbits) {
  int m = vnibble_size(val);
  uint64_t bias = (m == 1) ? 0 : kVnibbleThresholds[m - 2];
  uint64_t r = (uint64_t)val - bias;
  uint64_t pattern = 0;
  for (int d = 0; d < m; d++) {
    uint64_t digit = (r >> (3 * (m - 1 - d))) & 0x7;
    if (d == m - 1) digit |= 0x8;
    pattern = (pattern << 4) | digit;
  }
  *nbits = 4 * m;
  return pattern;
}

inline int64_t factor_offs_bitsize(int64_t offs) {
  return 8 + 4 * vnibble_size((uint32_t)((offs - kFactorOffsetMin) >> 8));
}

inline int64_t factor_len_bitsize(int64_t len) {
  int64_t v = len - kFactorLengthMin;
  return (v >> 3) + 1 + 3;
}

// ---------------------------------------------------------------------------
// Suffix array: SA-IS (induced sorting), O(n) worst case — a libsais-class
// baseline (the reference links libsais SA-IS, salz.c:465), replacing the
// round-2 Manber-Myers O(n log n) oracle so vs_baseline is honest
// (VERDICT round-2 item 2). Standard Nong-Zhang-Chan algorithm, written
// from the published description; works on an int alphabet with an
// explicit unique smallest sentinel so the recursion is uniform.
// ---------------------------------------------------------------------------
namespace sais {

inline bool is_lms(const std::vector<uint8_t>& t, int64_t i) {
  return i > 0 && t[i] && !t[i - 1];
}

// Induce L then S from LMS seeds already placed in sa (rest must be -1).
void induce(const int32_t* s, int32_t* sa, int64_t n, int64_t K,
            const std::vector<uint8_t>& t, const std::vector<int64_t>& cnt,
            std::vector<int64_t>& bkt) {
  // L-type: left-to-right from bucket heads.
  bkt[0] = 0;
  for (int64_t c = 1; c < K; c++) bkt[c] = bkt[c - 1] + cnt[c - 1];
  for (int64_t i = 0; i < n; i++) {
    int64_t j = sa[i];
    if (j > 0 && !t[j - 1]) sa[bkt[s[j - 1]]++] = (int32_t)(j - 1);
  }
  // S-type: right-to-left from bucket tails.
  int64_t acc = 0;
  for (int64_t c = 0; c < K; c++) {
    acc += cnt[c];
    bkt[c] = acc;
  }
  for (int64_t i = n - 1; i >= 0; i--) {
    int64_t j = sa[i];
    if (j > 0 && t[j - 1]) sa[--bkt[s[j - 1]]] = (int32_t)(j - 1);
  }
}

// s[0..n-1] with s[n-1] == 0 the unique minimum; writes SA of s into sa.
void core(const int32_t* s, int32_t* sa, int64_t n, int64_t K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  std::vector<uint8_t> t(n);
  t[n - 1] = 1;
  for (int64_t i = n - 2; i >= 0; i--)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  std::vector<int64_t> cnt(K, 0), bkt(K);
  for (int64_t i = 0; i < n; i++) cnt[s[i]]++;

  // Step 1: sort LMS substrings — seed LMS positions at bucket tails
  // (any order), induce.
  std::fill(sa, sa + n, -1);
  {
    int64_t acc = 0;
    for (int64_t c = 0; c < K; c++) {
      acc += cnt[c];
      bkt[c] = acc;
    }
    for (int64_t i = 1; i < n; i++)
      if (is_lms(t, i)) sa[--bkt[s[i]]] = (int32_t)i;
  }
  induce(s, sa, n, K, t, cnt, bkt);

  // Step 2: name LMS substrings in their sorted order.
  int64_t m = 0;
  for (int64_t i = 0; i < n; i++)
    if (is_lms(t, sa[i])) sa[m++] = sa[i];  // sorted LMS positions, prefix
  // names stored in the free upper half of sa (m <= n/2).
  int32_t* name_of = sa + m;  // indexed by position/2
  std::fill(name_of, name_of + (n - m), -1);
  int64_t names = 0;
  int64_t prev = -1;
  for (int64_t i = 0; i < m; i++) {
    int64_t p = sa[i];
    if (prev >= 0) {
      // Compare LMS substrings at prev and p (chars + types through the
      // next LMS position inclusive).
      int64_t a = prev, b = p;
      bool same = true;
      for (int64_t d = 0;; d++) {
        bool alms = d > 0 && is_lms(t, a + d);
        bool blms = d > 0 && is_lms(t, b + d);
        if (alms && blms) break;  // both substrings ended together
        if (alms != blms || s[a + d] != s[b + d] || t[a + d] != t[b + d]) {
          same = false;
          break;
        }
      }
      if (!same) names++;
    }
    name_of[p / 2] = (int32_t)names;
    prev = p;
  }
  names++;  // count

  // Step 3: order LMS suffixes.
  std::vector<int32_t> lms_pos;  // LMS positions in text order
  lms_pos.reserve(m);
  for (int64_t i = 1; i < n; i++)
    if (is_lms(t, i)) lms_pos.push_back((int32_t)i);
  std::vector<int32_t> order(m);
  if (names < m) {
    // Recurse on the reduced string (names in text order). Its last symbol
    // is the sentinel's LMS (position n-1, name 0, unique minimum).
    std::vector<int32_t> s1(m), sa1(m);
    for (int64_t i = 0, w = 0; i < n - m; i++)
      if (name_of[i] >= 0) s1[w++] = name_of[i];
    core(s1.data(), sa1.data(), m, names);
    for (int64_t i = 0; i < m; i++) order[i] = lms_pos[sa1[i]];
  } else {
    for (int64_t i = 0; i < m; i++) order[i] = sa[i];
  }

  // Step 4: induce the full SA from the sorted LMS suffixes: place them at
  // bucket tails in REVERSE sorted order, induce L, induce S.
  std::fill(sa, sa + n, -1);
  {
    int64_t acc = 0;
    for (int64_t c = 0; c < K; c++) {
      acc += cnt[c];
      bkt[c] = acc;
    }
    for (int64_t i = m - 1; i >= 0; i--) sa[--bkt[s[order[i]]]] = order[i];
  }
  induce(s, sa, n, K, t, cnt, bkt);
}

}  // namespace sais

void suffix_array(const uint8_t* t, int64_t n, int32_t* sa) {
  if (n <= 0) return;
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  // Append a unique smallest sentinel; SA of t equals SA of t+sentinel
  // minus its first entry (the sentinel suffix).
  std::vector<int32_t> s(n + 1), sa1(n + 1);
  for (int64_t i = 0; i < n; i++) s[i] = (int32_t)t[i] + 1;
  s[n] = 0;
  sais::core(s.data(), sa1.data(), n + 1, 257);
  std::memcpy(sa, sa1.data() + 1, n * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// PSV/NSV in text order via the sentinel stack scan (FORMAT.md §1.7).
// ---------------------------------------------------------------------------
void psv_nsv(const int32_t* sa, int64_t n, int32_t* psv, int32_t* nsv) {
  std::vector<int32_t> stack;
  stack.reserve(n + 2);
  stack.push_back(-1);
  for (int64_t i = 0; i <= n; i++) {
    int32_t cur = (i < n) ? sa[i] : -1;
    while (stack.back() > cur) {
      int32_t top = stack.back();
      stack.pop_back();
      psv[top] = stack.back();
      nsv[top] = cur;
    }
    stack.push_back(cur);
  }
}

inline int64_t lcp_extend(const uint8_t* t, int64_t n, int64_t seed, int64_t p1,
                          int64_t p2) {
  int64_t len = seed;
  while (p2 + len + 8 <= n) {
    uint64_t a, b;
    std::memcpy(&a, t + p1 + len, 8);
    std::memcpy(&b, t + p2 + len, 8);
    uint64_t diff = a ^ b;
    if (diff) return len + (__builtin_ctzll(diff) >> 3);
    len += 8;
  }
  while (p2 + len < n && t[p1 + len] == t[p2 + len]) len++;
  return len;
}

struct Candidates {
  std::vector<int32_t> psv_offs, psv_len, nsv_offs, nsv_len;
};

void factorize(const uint8_t* t, int64_t n, const int32_t* psv,
               const int32_t* nsv, Candidates* c) {
  c->psv_offs.assign(n, 0);
  c->psv_len.assign(n, 0);
  c->nsv_offs.assign(n, 0);
  c->nsv_len.assign(n, 0);
  if (n == 0) return;
  c->psv_len[0] = 1;  // forced literal at position 0
  c->nsv_len[0] = 1;
  int64_t prev_psv_len = 0, prev_nsv_len = 0;
  for (int64_t pos = 1; pos < n; pos++) {
    int64_t p = psv[pos], q = nsv[pos];
    int64_t plen = 0, qlen = 0;
    if (p != -1)
      plen = lcp_extend(t, n, prev_psv_len > 0 ? prev_psv_len - 1 : 0, p, pos);
    if (q != -1)
      qlen = lcp_extend(t, n, prev_nsv_len > 0 ? prev_nsv_len - 1 : 0, q, pos);
    prev_psv_len = plen;
    prev_nsv_len = qlen;
    c->psv_offs[pos] = (int32_t)(pos - p);
    c->psv_len[pos] = (int32_t)plen;
    c->nsv_offs[pos] = (int32_t)(pos - q);
    c->nsv_len[pos] = (int32_t)qlen;
  }
}

// Backward DP over positions n-1..1; tie order literal < PSV < NSV.
void optimize(const Candidates& c, int64_t n, std::vector<int32_t>* offs,
              std::vector<int32_t>* len) {
  offs->assign(n + 1, 0);
  len->assign(n + 1, 1);
  std::vector<int64_t> cost(n + 1, 0);
  for (int64_t p = n - 1; p >= 1; p--) {
    int64_t best_cost = 9 + cost[p + 1];
    int32_t best_offs = 0, best_len = 1;
    int64_t al = c.psv_len[p];
    if (al >= kFactorLengthMin) {
      int64_t ao = c.psv_offs[p];
      int64_t ac = 1 + factor_offs_bitsize(ao) + factor_len_bitsize(al) +
                   cost[p + al];
      if (ac < best_cost) {
        best_cost = ac;
        best_offs = (int32_t)ao;
        best_len = (int32_t)al;
      }
    }
    al = c.nsv_len[p];
    if (al >= kFactorLengthMin) {
      int64_t ao = c.nsv_offs[p];
      int64_t ac = 1 + factor_offs_bitsize(ao) + factor_len_bitsize(al) +
                   cost[p + al];
      if (ac < best_cost) {
        best_cost = ac;
        best_offs = (int32_t)ao;
        best_len = (int32_t)al;
      }
    }
    (*offs)[p] = best_offs;
    (*len)[p] = best_len;
    cost[p] = best_cost;
  }
}

// ---------------------------------------------------------------------------
// Interleaved bit/byte writer (FORMAT.md §1.3).
// ---------------------------------------------------------------------------
struct BitWriter {
  uint8_t* dst;
  int64_t cap;
  int64_t dst_pos = 4;  // stream header reserved
  uint64_t bits = 0;
  int64_t bits_avail = 0;
  int64_t bits_pos = 0;
  bool ok = true;

  void store_word(int64_t pos, uint64_t w) { std::memcpy(dst + pos, &w, 8); }

  void flush() {
    store_word(bits_pos, bits);
    if (dst_pos + 8 > cap) {
      ok = false;
      return;
    }
    bits = 0;
    bits_avail = 64;
    bits_pos = dst_pos;
    dst_pos += 8;
  }

  void write_bits(uint64_t v, int64_t count) {
    if (!ok) return;
    if (bits_avail == 0) {
      flush();
      if (!ok) return;
    }
    if (count > bits_avail) {
      int64_t take = bits_avail;
      bits = (bits << take) | ((v >> (count - take)) & ((1ull << take) - 1));
      count -= take;
      flush();
      if (!ok) return;
    }
    bits = (bits << count) | (count == 64 ? v : (v & ((1ull << count) - 1)));
    bits_avail -= count;
  }

  void write_zeros(int64_t count) {
    while (count && ok) {
      if (bits_avail == 0) {
        flush();
        if (!ok) return;
      }
      int64_t take = std::min(bits_avail, count);
      bits <<= take;
      bits_avail -= take;
      count -= take;
    }
  }

  void write_byte(uint8_t b) {
    if (!ok) return;
    if (dst_pos >= cap) {
      ok = false;
      return;
    }
    dst[dst_pos++] = b;
  }

  void finalize_bits() {
    bits <<= bits_avail;
    store_word(bits_pos, bits);
  }
};

}  // namespace

extern "C" {

// Test-only stage exports (used by tests/test_native.py to golden-check the
// native stages against the Python oracle).
void salz_ref_suffix_array(const uint8_t* src, int64_t n, int32_t* sa) {
  suffix_array(src, n, sa);
}

void salz_ref_psv_nsv(const int32_t* sa, int64_t n, int32_t* psv,
                      int32_t* nsv) {
  psv_nsv(sa, n, psv, nsv);
}

// Encode one block. Returns encoded length, or -1 on failure (block < 8 bytes,
// or SALZ layout overflowing dst_cap mid-emission — reference parity).
// dst must have room for at least max(dst_cap, 4 + src_len) bytes when the
// PLAIN fallback applies; callers pass cap >= encoded_len_max(block_size).
int64_t salz_ref_encode(const uint8_t* src, int64_t src_len, uint8_t* dst,
                        int64_t dst_cap) {
  if (src_len < kTailReserve) return -1;
  int64_t n = src_len - kTailReserve;

  std::vector<int32_t> offs, len;
  if (n > 0) {
    std::vector<int32_t> sa(n), psv(n), nsv(n);
    suffix_array(src, n, sa.data());
    psv_nsv(sa.data(), n, psv.data(), nsv.data());
    Candidates c;
    factorize(src, n, psv.data(), nsv.data(), &c);
    optimize(c, n, &offs, &len);
  } else {
    offs.assign(1, 0);
    len.assign(1, 1);
  }

  BitWriter w{dst, dst_cap};
  if (dst_cap < 12) w.ok = false;
  int64_t pos = 0;
  while (pos < n && w.ok) {
    int64_t l = len[pos];
    if (l == 1) {
      w.write_bits(0, 1);  // literal token
      w.write_byte(src[pos]);
      pos += 1;
    } else {
      int64_t o = offs[pos];
      w.write_bits(1, 1);  // factor token
      int nb;
      uint64_t pat = encode_vnibble((uint32_t)((o - kFactorOffsetMin) >> 8), &nb);
      w.write_bits(pat, nb);
      w.write_byte((uint8_t)((o - kFactorOffsetMin) & 0xFF));
      int64_t v = l - kFactorLengthMin;
      w.write_zeros(v >> 3);
      w.write_bits(1, 1);
      w.write_bits(v & 0x7, 3);
      pos += l;
    }
  }
  for (int i = 0; i < kTailReserve && w.ok; i++) {
    w.write_bits(0, 1);
    w.write_byte(src[n + i]);
  }
  if (!w.ok) return -1;
  w.finalize_bits();

  uint32_t hdr;
  if (w.dst_pos > src_len + 4) {
    // PLAIN fallback: strictly larger than plain + header.
    if (src_len + 4 > dst_cap) return -1;
    hdr = (0u << 24) | ((uint32_t)src_len & 0xFFFFFF);
    std::memcpy(dst, &hdr, 4);
    std::memcpy(dst + 4, src, src_len);
    return src_len + 4;
  }
  hdr = (1u << 24) | ((uint32_t)(w.dst_pos - 4) & 0xFFFFFF);
  std::memcpy(dst, &hdr, 4);
  return w.dst_pos;
}

// Decode one segment. Returns decoded length or -1 on failure.
int64_t salz_ref_decode(const uint8_t* src, int64_t src_len, uint8_t* dst,
                        int64_t dst_cap) {
  if (src_len < 4) return -1;
  uint32_t hdr;
  std::memcpy(&hdr, src, 4);
  uint32_t stream_type = hdr >> 24;
  int64_t stream_len = hdr & 0xFFFFFF;
  if (stream_type >= 2) return -1;
  if (stream_len > src_len - 4) return -1;
  const uint8_t* p = src + 4;

  if (stream_type == 0) {  // PLAIN
    if (stream_len > dst_cap) return -1;
    std::memcpy(dst, p, stream_len);
    return stream_len;
  }

  int64_t src_pos = 0, dst_pos = 0;
  uint64_t bits = 0;
  int64_t bits_avail = 0;
  auto queue = [&]() -> bool {
    if (src_pos + 8 > stream_len) return false;
    std::memcpy(&bits, p + src_pos, 8);
    src_pos += 8;
    bits_avail = 64;
    return true;
  };
  auto read_bits = [&](int64_t count, uint64_t* res) -> bool {
    if (bits_avail == 0 && !queue()) return false;
    if (count <= bits_avail) {
      *res = bits >> (64 - count);
      bits <<= count;
      bits_avail -= count;
      return true;
    }
    *res = bits >> (64 - bits_avail);
    count -= bits_avail;
    if (!queue()) return false;
    *res = (*res << count) | (bits >> (64 - count));
    bits <<= count;
    bits_avail -= count;
    return true;
  };
  auto read_unary = [&](uint32_t* res) -> bool {
    if (bits_avail == 0 && !queue()) return false;
    *res = 0;
    while (bits == 0) {
      *res += (uint32_t)bits_avail;
      if (!queue()) return false;
    }
    int64_t z = __builtin_clzll(bits);
    bits <<= z + 1;
    bits_avail -= z + 1;
    *res += (uint32_t)z;
    return true;
  };

  while (src_pos < stream_len) {
    uint64_t token;
    if (!read_bits(1, &token)) return -1;
    if (token == 0) {
      if (src_pos >= stream_len || dst_pos >= dst_cap) return -1;
      dst[dst_pos++] = p[src_pos++];
    } else {
      uint64_t nib;
      if (!read_bits(4, &nib)) return -1;
      uint64_t var = nib & 0x7;
      while (nib < 0x8) {
        if (!read_bits(4, &nib)) return -1;
        var = ((var + 1) << 3) | (nib & 0x7);
      }
      if (src_pos >= stream_len) return -1;
      uint8_t fixed = p[src_pos++];
      int64_t factor_offs = (int64_t)((var << 8) | fixed) + kFactorOffsetMin;
      uint32_t unary;
      uint64_t low3;
      if (!read_unary(&unary)) return -1;
      if (!read_bits(3, &low3)) return -1;
      int64_t factor_len = (int64_t)((unary << 3) | low3) + kFactorLengthMin;
      if (factor_offs > dst_pos) return -1;
      if (dst_pos + factor_len > dst_cap) return -1;
      // Overlap-correct factor copy with an 8-byte-wide fast path. The
      // format guarantees factors end >= 8 bytes before block end
      // (FORMAT.md tail invariant), so the wide loop's <= 7-byte overrun
      // stays inside dst for well-formed streams; the dst_cap guard keeps
      // malformed streams on the exact byte-wise path instead.
      uint8_t* d = dst + dst_pos;
      const uint8_t* s = d - factor_offs;
      int64_t len = factor_len;
      if (dst_pos + factor_len + 8 <= dst_cap) {
        if (factor_offs >= 8) {
          for (int64_t i = 0; i < len; i += 8)
            std::memcpy(d + i, s + i, 8);
        } else {
          // Short period: emit one period's worth byte-wise until >= 8
          // bytes exist behind the cursor, then read from a distance that
          // is the smallest multiple of the period >= 8 — same bytes by
          // periodicity, no overlap inside an 8-byte step.
          int64_t head = len < 8 ? len : 8;
          for (int64_t i = 0; i < head; i++) d[i] = s[i];
          if (len > 8) {
            // Smallest multiple of the period >= 8; always < 8 + period,
            // so reads stay inside the already-written/source region.
            int64_t dist = ((8 + factor_offs - 1) / factor_offs) * factor_offs;
            for (int64_t i = 8; i < len; i += 8)
              std::memcpy(d + i, d + i - dist, 8);
          }
        }
      } else {
        for (int64_t i = 0; i < len; i++) d[i] = s[i];
      }
      dst_pos += factor_len;
    }
  }
  return dst_pos;
}

}  // extern "C"
