// Native host block codec for TPU-MinLZ.
//
// Implements the MinLZ specification v1.0 block format: a margin-split
// decoder (fast loop + strict tail) and a greedy hash-table LZ77 encoder
// with four effort levels.  This is the host-side runtime path (CLI, stream
// fallback for foreign hint-less blocks); the TPU kernels are the primary
// compute path.  Behavioral parity targets: reference decode.go:178 and
// encode_l1.go:39 (clean-room from SPEC.md).

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

#define MINLZ_EXPORT __attribute__((visibility("default")))

namespace {

constexpr size_t kMaxBlock = 8u << 20;

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
inline uint64_t load64(const uint8_t* p) {
  uint64_t v;
  memcpy(&v, p, 8);
  return v;
}
inline void store16(uint8_t* p, uint16_t v) { memcpy(p, &v, 2); }
inline void store32(uint8_t* p, uint32_t v) { memcpy(p, &v, 4); }

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

// Returns bytes written to dst, or -1 on corrupt input.
long decode_body(const uint8_t* src, size_t slen, uint8_t* dst, size_t want) {
  size_t s = 0, d = 0;
  uint32_t offset = 1;

  while (s < slen) {
    uint32_t b = src[s++];
    uint32_t tag = b & 3;
    uint32_t val = b >> 2;
    uint32_t length;

    if (tag == 0) {
      bool repeat = val & 1;
      uint32_t code = val >> 1;
      if (code < 29) {
        length = code + 1;
      } else {
        uint32_t nb = code - 28;
        if (s + nb > slen) return -1;
        length = 0;
        for (uint32_t i = 0; i < nb; i++) length |= (uint32_t)src[s + i] << (8 * i);
        length += 30;
        s += nb;
      }
      if (!repeat) {
        if (s + length > slen || d + length > want) return -1;
        // Literal copy; memcpy is safe (disjoint buffers).
        memcpy(dst + d, src + s, length);
        s += length;
        d += length;
        continue;
      }
      // repeat: fall through to copy with current offset
    } else if (tag == 1) {
      if (s >= slen) return -1;
      uint32_t lcode = val & 15;
      offset = ((uint32_t)src[s] << 2 | (val >> 4)) + 1;
      s++;
      if (lcode == 15) {
        if (s >= slen) return -1;
        length = (uint32_t)src[s++] + 18;
      } else {
        length = lcode + 4;
      }
    } else if (tag == 2) {
      if (s + 2 > slen) return -1;
      offset = ((uint32_t)src[s] | (uint32_t)src[s + 1] << 8) + 64;
      s += 2;
      if (val <= 60) {
        length = val + 4;
      } else {
        uint32_t nb = val - 60;
        if (s + nb > slen) return -1;
        length = 0;
        for (uint32_t i = 0; i < nb; i++) length |= (uint32_t)src[s + i] << (8 * i);
        length += 64;
        s += nb;
      }
    } else {
      bool is3 = val & 1;
      uint32_t litlen = (val >> 1) & 3;
      if (!is3) {
        // Fused Copy2
        if (s + 2 > slen) return -1;
        offset = ((uint32_t)src[s] | (uint32_t)src[s + 1] << 8) + 64;
        s += 2;
        length = (val >> 3) + 4;
        litlen += 1;
      } else {
        if (s + 3 > slen) return -1;
        uint32_t full = val | ((uint32_t)src[s] | (uint32_t)src[s + 1] << 8 |
                               (uint32_t)src[s + 2] << 16)
                                  << 6;
        s += 3;
        offset = (full >> 9) + 65536;
        uint32_t code = (full >> 3) & 63;
        if (code < 61) {
          length = code + 4;
        } else {
          uint32_t nb = code - 60;
          if (s + nb > slen) return -1;
          length = 0;
          for (uint32_t i = 0; i < nb; i++) length |= (uint32_t)src[s + i] << (8 * i);
          length += 64;
          s += nb;
        }
      }
      if (litlen) {
        if (s + litlen > slen || d + litlen > want) return -1;
        memcpy(dst + d, src + s, litlen);
        s += litlen;
        d += litlen;
      }
    }

    // Execute copy.
    if (offset > d || d + length > want) return -1;
    size_t from = d - offset;
    if (offset >= length) {
      memcpy(dst + d, dst + from, length);
    } else {
      // Overlapping copy is periodic with period `offset`; replicate by
      // doubling, always sourcing a whole number of periods back so every
      // source byte is already final.
      size_t done = 0;
      size_t avail = offset;
      while (done < length) {
        size_t take = length - done < avail ? length - done : avail;
        memcpy(dst + d + done, dst + d + done - avail, take);
        done += take;
        avail *= 2;
      }
    }
    d += length;
  }
  return d == want ? (long)d : -1;
}

// ---------------------------------------------------------------------------
// Encoder: greedy single-slot hash table (reference L1-style)
// ---------------------------------------------------------------------------

inline uint32_t hash4(uint32_t v, int bits) {
  return (v * 2654435761u) >> (32 - bits);
}

void emit_literals(std::vector<uint8_t>& out, const uint8_t* lits, size_t n) {
  if (!n) return;
  if (n < 30) {
    out.push_back((uint8_t)((n - 1) << 3));
  } else {
    uint32_t v = n - 30;
    if (v < 256) {
      out.push_back(29 << 3);
      out.push_back((uint8_t)v);
    } else if (v < 65536) {
      out.push_back(30 << 3);
      out.push_back((uint8_t)v);
      out.push_back((uint8_t)(v >> 8));
    } else {
      out.push_back(31u << 3);
      out.push_back((uint8_t)v);
      out.push_back((uint8_t)(v >> 8));
      out.push_back((uint8_t)(v >> 16));
    }
  }
  out.insert(out.end(), lits, lits + n);
}

void emit_repeat(std::vector<uint8_t>& out, uint32_t length) {
  uint32_t v = length - 1;
  if (v < 29) {
    out.push_back((uint8_t)(v << 3 | 4));
    return;
  }
  v = length - 30;
  if (v < 256) {
    out.push_back(29 << 3 | 4);
    out.push_back((uint8_t)v);
  } else if (v < 65536) {
    out.push_back(30 << 3 | 4);
    out.push_back((uint8_t)v);
    out.push_back((uint8_t)(v >> 8));
  } else {
    out.push_back((uint8_t)(31u << 3 | 4));
    out.push_back((uint8_t)v);
    out.push_back((uint8_t)(v >> 8));
    out.push_back((uint8_t)(v >> 16));
  }
}

void emit_copy1(std::vector<uint8_t>& out, uint32_t offset, uint32_t length) {
  uint32_t o = offset - 1;
  if (length <= 18) {
    uint16_t x = (uint16_t)(o << 6 | (length - 4) << 2 | 1);
    out.push_back((uint8_t)x);
    out.push_back((uint8_t)(x >> 8));
  } else if (length <= 273) {
    uint16_t x = (uint16_t)(o << 6 | 15 << 2 | 1);
    out.push_back((uint8_t)x);
    out.push_back((uint8_t)(x >> 8));
    out.push_back((uint8_t)(length - 18));
  } else {
    uint16_t x = (uint16_t)(o << 6 | 14 << 2 | 1);
    out.push_back((uint8_t)x);
    out.push_back((uint8_t)(x >> 8));
    emit_repeat(out, length - 18);
  }
}

void emit_copy2(std::vector<uint8_t>& out, uint32_t offset, uint32_t length) {
  uint32_t o = offset - 64;
  uint32_t l = length - 4;
  if (l <= 60) {
    out.push_back((uint8_t)(l << 2 | 2));
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    return;
  }
  l -= 60;
  if (l < 256) {
    out.push_back(61 << 2 | 2);
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    out.push_back((uint8_t)l);
  } else if (l < 65536) {
    out.push_back(62 << 2 | 2);
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    out.push_back((uint8_t)l);
    out.push_back((uint8_t)(l >> 8));
  } else {
    out.push_back((uint8_t)(63u << 2 | 2));
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    out.push_back((uint8_t)l);
    out.push_back((uint8_t)(l >> 8));
    out.push_back((uint8_t)(l >> 16));
  }
}

void emit_copy3(std::vector<uint8_t>& out, uint32_t offset, uint32_t length,
                const uint8_t* lits, uint32_t nlits) {
  uint32_t o = offset - 65536;
  uint32_t l = length - 4;
  uint32_t word = 7 | nlits << 3 | o << 11;
  if (l <= 60) {
    word |= l << 5;
    out.push_back((uint8_t)word);
    out.push_back((uint8_t)(word >> 8));
    out.push_back((uint8_t)(word >> 16));
    out.push_back((uint8_t)(word >> 24));
  } else {
    l -= 60;
    uint32_t code = l < 256 ? 61 : l < 65536 ? 62 : 63;
    word |= code << 5;
    out.push_back((uint8_t)word);
    out.push_back((uint8_t)(word >> 8));
    out.push_back((uint8_t)(word >> 16));
    out.push_back((uint8_t)(word >> 24));
    out.push_back((uint8_t)l);
    if (code >= 62) out.push_back((uint8_t)(l >> 8));
    if (code == 63) out.push_back((uint8_t)(l >> 16));
  }
  out.insert(out.end(), lits, lits + nlits);
}

void emit_fused2(std::vector<uint8_t>& out, const uint8_t* lits,
                 uint32_t nlits, uint32_t offset, uint32_t length) {
  uint32_t o = offset - 64;
  uint32_t l = length - 4;
  if (l > 7) {
    out.push_back((uint8_t)(3 | (nlits - 1) << 3 | 7u << 5));
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    out.insert(out.end(), lits, lits + nlits);
    emit_repeat(out, l - 7);
  } else {
    out.push_back((uint8_t)(3 | (nlits - 1) << 3 | l << 5));
    out.push_back((uint8_t)o);
    out.push_back((uint8_t)(o >> 8));
    out.insert(out.end(), lits, lits + nlits);
  }
}

size_t put_uvarint(uint8_t* p, uint64_t v) {
  size_t i = 0;
  while (v >= 0x80) {
    p[i++] = (uint8_t)(v | 0x80);
    v >>= 7;
  }
  p[i++] = (uint8_t)v;
  return i;
}

long encode_greedy(const uint8_t* src, size_t n, std::vector<uint8_t>& out,
                   int table_bits) {
  std::vector<uint32_t> table((size_t)1 << table_bits, 0);
  const size_t s_limit = n - 4;
  const size_t dst_limit = n - 1;  // body must be < n

  size_t next_emit = 0;
  size_t s = 1;
  uint32_t rep = 0;

  while (true) {
    // Probe for a match.
    size_t candidate;
    uint32_t cv;
    while (true) {
      if (s > s_limit) goto remainder;
      cv = load32(src + s);
      uint32_t h = hash4(cv, table_bits);
      candidate = table[h];
      table[h] = (uint32_t)s;
      if (candidate && s - candidate <= (2u << 20) + 65535 &&
          cv == load32(src + candidate))
        break;
      s++;
    }
    {
      size_t base = s;
      size_t c = candidate + 4;
      s += 4;
      while (s < n && src[s] == src[c]) {
        s++;
        c++;
      }
      // Backward extension over pending literals.
      while (base > next_emit && candidate > 0 &&
             src[base - 1] == src[candidate - 1]) {
        base--;
        candidate--;
      }
      uint32_t offset = (uint32_t)(base - candidate);
      uint32_t length = (uint32_t)(s - base);
      size_t nlits = base - next_emit;
      const uint8_t* lits = src + next_emit;

      bool fused = false;
      if (nlits && offset != rep && offset >= 64 &&
          (nlits <= 3 || (offset <= 65599 && nlits <= 4))) {
        if (offset <= 65599) {
          emit_fused2(out, lits, (uint32_t)nlits, offset, length);
        } else {
          emit_copy3(out, offset, length, lits, (uint32_t)nlits);
        }
        fused = true;
      } else if (nlits) {
        if (out.size() + nlits > dst_limit) return -1;
        emit_literals(out, lits, nlits);
      }
      if (!fused) {
        if (offset == rep) {
          emit_repeat(out, length);
        } else if (offset <= 1024) {
          emit_copy1(out, offset, length);
        } else if (offset <= 65599) {
          emit_copy2(out, offset, length);
        } else {
          emit_copy3(out, offset, length, nullptr, 0);
        }
      }
      rep = offset;
      next_emit = s;
      if (s > s_limit) goto remainder;
      if (out.size() > dst_limit) return -1;

      // Index interior positions (denser for better ratio at small cost).
      size_t step = length < 256 ? 1 : 2;
      for (size_t i = base + 1; i + 4 <= s && i + 4 <= n; i += step)
        table[hash4(load32(src + i), table_bits)] = (uint32_t)i;
    }
  }

remainder:
  if (next_emit < n) {
    if (out.size() + (n - next_emit) > dst_limit) return -1;
    emit_literals(out, src + next_emit, n - next_emit);
  }
  return (long)out.size();
}

}  // namespace

extern "C" {

// Decode a full block (with 0x00 marker + uvarint header).
// Returns bytes written or negative on error.
MINLZ_EXPORT long minlz_decode_block(const uint8_t* src, size_t slen,
                                     uint8_t* dst, size_t dcap) {
  if (slen == 0 || src[0] != 0) return -1;
  if (slen == 1) return 0;
  size_t pos = 1;
  uint64_t want = 0;
  int shift = 0;
  while (true) {
    if (pos >= slen || shift > 63) return -1;
    uint8_t b = src[pos++];
    want |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) break;
    shift += 7;
  }
  if (want > kMaxBlock) return -1;
  if (want == 0) {
    // Literal-only block.
    size_t n = slen - pos;
    if (n > dcap) return -2;
    memcpy(dst, src + pos, n);
    return (long)n;
  }
  if (want < slen - pos) return -1;
  if (want > dcap) return -2;
  return decode_body(src + pos, slen - pos, dst, want);
}

// Encode a block at the given level (-1, 1, 2, 3). Returns bytes written.
MINLZ_EXPORT long minlz_encode_block(const uint8_t* src, size_t n,
                                     uint8_t* dst, size_t dcap, int level) {
  if (n > kMaxBlock) return -1;
  auto uncompressed = [&]() -> long {
    if (n == 0) {
      if (dcap < 1) return -2;
      dst[0] = 0;
      return 1;
    }
    if (n + 2 > dcap) return -2;
    dst[0] = 0;
    dst[1] = 0;
    memcpy(dst + 2, src, n);
    return (long)(n + 2);
  };
  if (n <= 16) return uncompressed();

  int bits = level <= -1 ? 13 : level == 1 ? 15 : level == 2 ? 17 : 18;
  std::vector<uint8_t> body;
  body.reserve(n / 2);
  long blen = encode_greedy(src, n, body, bits);
  if (blen < 0) return uncompressed();

  uint8_t hdr[12];
  size_t hl = 1;
  hdr[0] = 0;
  hl += put_uvarint(hdr + 1, n);
  if (hl + body.size() > dcap) return -2;
  memcpy(dst, hdr, hl);
  memcpy(dst + hl, body.data(), body.size());
  return (long)(hl + body.size());
}

}  // extern "C"

extern "C" {

// Serialize a compacted op list (from the TPU greedy parse) into a MinLZ
// block body with per-segment hint offsets.
//   pos/off/len/isrep: arrays of `count` ops, ascending global positions,
//   never crossing segment boundaries.  hints_out: comp offset per segment
//   (nseg = ceil(n/seg)).  Returns body size or negative on overflow.
MINLZ_EXPORT long minlz_serialize_ops(
    const uint8_t* src, size_t n, const int32_t* pos, const int32_t* off,
    const int32_t* len, const int32_t* isrep, size_t count, size_t seg,
    uint8_t* out, size_t outcap, int64_t* hints_out) {
  std::vector<uint8_t> body;
  body.reserve(n / 2);
  size_t nseg = (n + seg - 1) / seg;
  size_t i = 0;
  for (size_t si = 0; si < nseg; si++) {
    size_t s0 = si * seg;
    size_t s1 = s0 + seg < n ? s0 + seg : n;
    hints_out[si] = (int64_t)body.size();
    size_t lit_start = s0;
    int64_t rep = -1;
    while (i < count && (size_t)pos[i] < s1) {
      size_t p = (size_t)pos[i];
      uint32_t o = (uint32_t)off[i];
      uint32_t l = (uint32_t)len[i];
      const uint8_t* lits = src + lit_start;
      size_t nlits = p - lit_start;
      bool fused = false;
      if (o == (uint64_t)rep) {
        if (nlits) emit_literals(body, lits, nlits);
        emit_repeat(body, l);
      } else {
        if (nlits && o >= 64 &&
            (nlits <= 3 || (o <= 65599 && nlits <= 4))) {
          if (o <= 65599) {
            emit_fused2(body, lits, (uint32_t)nlits, o, l);
          } else {
            emit_copy3(body, o, l, lits, (uint32_t)nlits);
          }
          fused = true;
        } else if (nlits) {
          emit_literals(body, lits, nlits);
        }
        if (!fused) {
          if (o <= 1024) emit_copy1(body, o, l);
          else if (o <= 65599) emit_copy2(body, o, l);
          else emit_copy3(body, o, l, nullptr, 0);
        }
        rep = o;
      }
      lit_start = p + l;
      i++;
    }
    if (lit_start < s1) emit_literals(body, src + lit_start, s1 - lit_start);
  }
  if (body.size() > outcap) return -2;
  memcpy(out, body.data(), body.size());
  return (long)body.size();
}

}  // extern "C"
