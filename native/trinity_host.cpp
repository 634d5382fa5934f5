// trinity_host — native host-side hot paths for trinity_tpu.
//
// The reference is a native C++ library; its indexing hot loop is PFor block
// encoding (~69% of indexing time per the engineering note at
// indexer.cpp:302-310). This library provides the same role for the
// TPU-native format: one pass over sorted postings emits every per-block
// skip field and the transposed bit-plane matrix (see
// trinity_tpu/utils/bitpack.py for the layout contract), plus the
// prefix-compressed terms dictionary (terms.cpp:126-172 analog).
//
// Exposed as a C ABI consumed via ctypes (trinity_tpu/utils/native.py);
// numpy-based fallbacks exist for every entry point.

#include <cstdint>
#include <cstring>

namespace {

constexpr int kBlock = 128;
constexpr int kPlanesPerWord = 32;

inline int bit_width_u32(uint32_t v) { return v ? 32 - __builtin_clz(v) : 0; }

// Append one bit-plane group for `vals[0..count)` with `bits` planes into the
// plane matrix `planes` (row-major, 128 lanes per word row), starting at
// plane row `p0`. Values beyond count are zero.
inline void emit_planes(uint32_t* planes, int64_t p0, const uint32_t* vals,
                        int count, int bits) {
  for (int j = 0; j < bits; ++j) {
    const int64_t p = p0 + j;
    uint32_t* row = planes + (p / kPlanesPerWord) * kBlock;
    const uint32_t bit = 1u << (p % kPlanesPerWord);
    for (int i = 0; i < count; ++i) {
      if ((vals[i] >> j) & 1u) row[i] |= bit;
    }
  }
}

}  // namespace

extern "C" {

// Build all block arrays + the packed plane matrix from sorted postings.
//
// Inputs:
//   n_terms, posting_start[n_terms+1]: postings of term t are
//     [posting_start[t], posting_start[t+1]) in p_doc/p_freq/p_hits_off.
//   p_doc:      local doc ids, ascending within a term.
//   p_freq:     term frequency per posting (>= 1).
//   p_hits_off: offset of the posting's positions in the positions stream.
// Outputs (caller-allocated; n_blocks = sum over terms of ceil(df/128)):
//   per-block arrays + `planes` (zero-initialized, word rows x 128).
// Returns the number of plane rows used, or -1 on error.
int64_t trin_build_blocks(
    int64_t n_terms, const int64_t* posting_start, const uint32_t* p_doc,
    const uint32_t* p_freq, const uint32_t* p_hits_off,
    uint32_t* block_plane_off, uint32_t* block_first, uint32_t* block_last,
    int32_t* block_count, uint8_t* bits_doc, uint8_t* bits_freq,
    uint32_t* block_hits_off, uint32_t* planes) {
  int64_t b = 0;
  int64_t plane_off = 0;
  uint32_t deltas[kBlock];
  uint32_t f1[kBlock];
  for (int64_t t = 0; t < n_terms; ++t) {
    const int64_t ps = posting_start[t], pe = posting_start[t + 1];
    for (int64_t off = ps; off < pe; off += kBlock, ++b) {
      const int count = static_cast<int>(pe - off < kBlock ? pe - off : kBlock);
      uint32_t max_delta = 0, max_f1 = 0;
      uint32_t prev = p_doc[off];
      deltas[0] = 0;
      for (int i = 0; i < count; ++i) {
        const uint32_t d = p_doc[off + i];
        if (i) {
          if (d <= prev) return -1;  // postings must be strictly ascending
          deltas[i] = d - prev;
          if (deltas[i] > max_delta) max_delta = deltas[i];
        }
        prev = d;
        const uint32_t fr = p_freq[off + i];
        // >= : freq == 2^16 would wrap the uint16 block_max_freq WAND bound
        if (fr == 0 || fr >= (1u << 16)) return -1;
        f1[i] = fr - 1;
        if (f1[i] > max_f1) max_f1 = f1[i];
      }
      const int bd = bit_width_u32(max_delta);
      const int bf = bit_width_u32(max_f1);
      block_plane_off[b] = static_cast<uint32_t>(plane_off);
      block_first[b] = p_doc[off];
      block_last[b] = prev;
      block_count[b] = count;
      bits_doc[b] = static_cast<uint8_t>(bd);
      bits_freq[b] = static_cast<uint8_t>(bf);
      block_hits_off[b] = p_hits_off[off];
      emit_planes(planes, plane_off, deltas, count, bd);
      emit_planes(planes, plane_off + bd, f1, count, bf);
      plane_off += bd + bf;
    }
  }
  return plane_off;
}

// Decode ALL blocks back to flat (docids, freqs) arrays — the whole-segment
// inverse of trin_build_blocks, used by merge/compaction (the reference's
// codec-native merge reads participants through block cursors,
// lucene_codec.cpp:963-1393; here one linear pass decodes everything).
// out_docs/out_freqs are caller-allocated with sum(block_count) entries.
// Returns postings written, or -1 on error.
int64_t trin_decode_blocks(int64_t n_blocks, const uint32_t* planes,
                           const uint32_t* block_plane_off,
                           const uint8_t* bits_doc, const uint8_t* bits_freq,
                           const uint32_t* block_first,
                           const int32_t* block_count, uint32_t* out_docs,
                           uint32_t* out_freqs) {
  int64_t o = 0;
  uint32_t deltas[kBlock];
  uint32_t f1[kBlock];
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int count = block_count[b];
    if (count < 1 || count > kBlock) return -1;
    const int bd = bits_doc[b], bf = bits_freq[b];
    const int64_t p0 = block_plane_off[b];
    std::memset(deltas, 0, sizeof(uint32_t) * count);
    std::memset(f1, 0, sizeof(uint32_t) * count);
    for (int j = 0; j < bd; ++j) {
      const int64_t p = p0 + j;
      const uint32_t* row = planes + (p / kPlanesPerWord) * kBlock;
      const uint32_t bit = 1u << (p % kPlanesPerWord);
      for (int i = 0; i < count; ++i) {
        deltas[i] |= (uint32_t)((row[i] & bit) != 0) << j;
      }
    }
    for (int j = 0; j < bf; ++j) {
      const int64_t p = p0 + bd + j;
      const uint32_t* row = planes + (p / kPlanesPerWord) * kBlock;
      const uint32_t bit = 1u << (p % kPlanesPerWord);
      for (int i = 0; i < count; ++i) {
        f1[i] |= (uint32_t)((row[i] & bit) != 0) << j;
      }
    }
    uint32_t d = block_first[b];
    for (int i = 0; i < count; ++i) {
      d += deltas[i];  // deltas[0] is 0 by construction
      out_docs[o] = d;
      out_freqs[o] = f1[i] + 1;
      ++o;
    }
  }
  return o;
}

// ---------------------------------------------------------------- terms
// Prefix-compressed terms dictionary (terms.cpp:126-172 analog).
// Terms are provided as a concatenated byte blob + offsets, sorted.
// Returns bytes written to `data`, and fills skip (ordinal, offset) pairs
// every `interval` terms; *n_skips receives the pair count.
static void put_varint(uint8_t*& p, uint32_t v) {
  while (v >= 0x80) {
    *p++ = static_cast<uint8_t>(v) | 0x80;
    v >>= 7;
  }
  *p++ = static_cast<uint8_t>(v);
}

int64_t trin_pack_terms(int64_t n_terms, const uint8_t* blob,
                        const int64_t* offsets /* n_terms+1 */, int interval,
                        uint8_t* data, uint32_t* skips /* 2*ceil(n/interval) */,
                        int64_t* n_skips) {
  uint8_t* p = data;
  int64_t ns = 0;
  const uint8_t* prev = nullptr;
  int64_t prev_len = 0;
  for (int64_t i = 0; i < n_terms; ++i) {
    const uint8_t* term = blob + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    int64_t shared = 0;
    if (i % interval == 0) {
      skips[2 * ns] = static_cast<uint32_t>(i);
      skips[2 * ns + 1] = static_cast<uint32_t>(p - data);
      ++ns;
    } else {
      const int64_t m = len < prev_len ? len : prev_len;
      while (shared < m && term[shared] == prev[shared]) ++shared;
    }
    put_varint(p, static_cast<uint32_t>(shared));
    put_varint(p, static_cast<uint32_t>(len - shared));
    std::memcpy(p, term + shared, len - shared);
    p += len - shared;
    prev = term;
    prev_len = len;
  }
  *n_skips = ns;
  return p - data;
}

}  // extern "C"

extern "C" {

// Pack a value stream into 128-value plane-packed groups (the positions /
// "hits" stream codec; layout contract in trinity_tpu/utils/bitpack.py
// pack_value_groups). Caller allocates `words` zeroed with
// ceil(sum(bits)/32)+1 rows of 128 u32 (worst case bits=32/group) and
// `group_bits` (n_groups). Returns total plane rows used.
int64_t trin_pack_value_groups(int64_t n_values, const uint32_t* values,
                               uint32_t* words, uint8_t* group_bits) {
  const int64_t n_groups = (n_values + kBlock - 1) / kBlock;
  int64_t plane = 0;
  for (int64_t g = 0; g < n_groups; ++g) {
    const int64_t base = g * kBlock;
    const int count =
        static_cast<int>(n_values - base < kBlock ? n_values - base : kBlock);
    uint32_t mx = 0;
    for (int i = 0; i < count; ++i) mx |= values[base + i];
    const int b = bit_width_u32(mx);
    group_bits[g] = static_cast<uint8_t>(b);
    for (int j = 0; j < b; ++j) {
      const int64_t p = plane + j;
      uint32_t* row = words + (p / kPlanesPerWord) * kBlock;
      const uint32_t bit = 1u << (p % kPlanesPerWord);
      for (int i = 0; i < count; ++i) {
        if ((values[base + i] >> j) & 1u) row[i] |= bit;
      }
    }
    plane += b;
  }
  return plane;
}

}  // extern "C"
