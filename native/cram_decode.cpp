// Native CRAM 3.0 container decode -> BAM record bodies.
//
// Throughput-grade counterpart of hipstr_tpu/io/cram.py (independent
// implementation from the public CRAM 3.0 specification; the reference
// consumes CRAM through htslib's cram codecs, lib/htslib/cram/).  One call
// decodes a whole container — block decompression (raw/gzip/rANS-4x8),
// data-series codecs (EXTERNAL/HUFFMAN/BETA/GAMMA/SUBEXP/BYTE_ARRAY_LEN/
// BYTE_ARRAY_STOP), feature-based sequence reconstruction against the
// reference, mate resolution and template lengths — and emits standard BAM
// record BODIES (the same layout io/bam.py fetch_raw returns), so the
// existing native filter cascade (bam_filter.cpp) runs unchanged on CRAM
// input.  Python (io/cram.py CramReader.fetch_raw) keeps container/crai
// bookkeeping and falls back to its object path whenever this returns an
// error (unsupported codec, multi-ref slice, bz2/lzma blocks).
//
// Byte-level parity with the Python decoder is pinned by tests/test_cram.py.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct BS {  // byte stream
  const uint8_t* p;
  int64_t len;
  int64_t pos = 0;
  bool err = false;

  uint8_t u8() {
    if (pos >= len) { err = true; return 0; }
    return p[pos++];
  }
  uint32_t u32le() {
    if (pos + 4 > len) { err = true; return 0; }
    uint32_t v;
    std::memcpy(&v, p + pos, 4);
    pos += 4;
    return v;
  }
  const uint8_t* take(int64_t n) {
    if (pos + n > len) { err = true; return nullptr; }
    const uint8_t* r = p + pos;
    pos += n;
    return r;
  }
  int64_t itf8() {
    uint32_t b1 = u8();
    uint64_t v;
    if (b1 < 0x80) return (int64_t)b1;
    if (b1 < 0xC0) return (int64_t)(((b1 & 0x3F) << 8) | u8());
    if (b1 < 0xE0) return (int64_t)(((b1 & 0x1F) << 16) | (u8() << 8) | u8());
    if (b1 < 0xF0) {
      v = ((uint64_t)(b1 & 0x0F) << 24) | ((uint64_t)u8() << 16) |
          ((uint64_t)u8() << 8) | u8();
    } else {
      v = ((uint64_t)(b1 & 0x0F) << 28) | ((uint64_t)u8() << 20) |
          ((uint64_t)u8() << 12) | ((uint64_t)u8() << 4) | (u8() & 0x0F);
    }
    // ITF8 stores int32; reinterpret the top bit as sign
    if (v >= (1ull << 31)) return (int64_t)v - (1ll << 32);
    return (int64_t)v;
  }
  int64_t ltf8() {
    uint32_t b1 = u8();
    int n_extra = 0;
    uint32_t mask = 0x80;
    while (n_extra < 8 && (b1 & mask)) { n_extra++; mask >>= 1; }
    if (n_extra == 0) return (int64_t)b1;
    uint64_t v;
    if (n_extra >= 8) {
      v = 0;
      for (int i = 0; i < 8; ++i) v = (v << 8) | u8();
    } else {
      v = b1 & ((1u << (7 - n_extra)) - 1);
      for (int i = 0; i < n_extra; ++i) v = (v << 8) | u8();
    }
    return (int64_t)v;  // two's complement reinterpretation == python's
  }
};

struct BitS {  // MSB-first bit stream over the core block
  const uint8_t* p;
  int64_t len;
  int64_t byte_pos = 0;
  int bit_pos = 0;
  bool err = false;

  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (byte_pos >= len) { err = true; return v; }
      v = (v << 1) | ((p[byte_pos] >> (7 - bit_pos)) & 1);
      if (++bit_pos == 8) { bit_pos = 0; byte_pos++; }
    }
    return v;
  }
};

// ------------------------------------------------------------- rANS 4x8
static bool rans_read_table(BS& st, uint32_t* F, uint32_t* C, uint8_t* lookup,
                            bool zero_is_total) {
  const int TOTFREQ = 1 << 12;
  std::memset(F, 0, 256 * sizeof(uint32_t));
  std::memset(lookup, 0, TOTFREQ);
  int sym = st.u8();
  int rle = 0;
  while (!st.err) {
    uint32_t f = st.u8();
    if (f >= 0x80) f = ((f & 0x7F) << 8) | st.u8();
    if (zero_is_total && f == 0) f = TOTFREQ;  // htslib order-1 quirk
    if (sym >= 0 && sym < 256) F[sym] = f;
    if (rle > 0) {
      rle--;
      sym++;
    } else {
      int nxt = st.u8();
      if (nxt == sym + 1) rle = st.u8();
      sym = nxt;
      if (sym == 0) break;
    }
  }
  if (st.err) return false;
  C[0] = 0;
  for (int s = 0; s < 256; ++s) C[s + 1] = C[s] + F[s];
  if (C[256] > (uint32_t)TOTFREQ) return false;
  for (int s = 0; s < 256; ++s)
    if (F[s]) std::memset(lookup + C[s], s, F[s]);
  if (C[256] < (uint32_t)TOTFREQ && C[256] > 0)  // historically 4095 filled
    lookup[C[256]] = lookup[C[256] - 1];
  return true;
}

static bool rans4x8_decode(const uint8_t* in, int64_t in_len,
                           std::vector<uint8_t>& out) {
  BS st{in, in_len};
  const int TF = 12;
  const uint32_t TOTFREQ = 1u << TF;
  const uint32_t RANS_LOW = 1u << 23;
  int order = st.u8();
  st.u32le();
  uint32_t n_out = st.u32le();
  if (st.err) return false;
  out.resize(n_out);
  if (order == 0) {
    std::vector<uint32_t> F(256), C(257);
    std::vector<uint8_t> lookup(TOTFREQ);
    if (!rans_read_table(st, F.data(), C.data(), lookup.data(), false))
      return false;
    uint32_t R[4];
    for (int j = 0; j < 4; ++j) R[j] = st.u32le();
    if (st.err) return false;
    const uint8_t* buf = st.p;
    int64_t pos = st.pos, blen = st.len;
    uint32_t out_end = n_out & ~3u;
    for (uint32_t i = 0; i < out_end; ++i) {
      int j = i & 3;
      uint32_t r = R[j];
      uint32_t m = r & (TOTFREQ - 1);
      uint8_t s = lookup[m];
      out[i] = s;
      r = F[s] * (r >> TF) + m - C[s];
      while (r < RANS_LOW && pos < blen) r = (r << 8) | buf[pos++];
      R[j] = r;
    }
    // remainder: peek-only with streams 0..2 (htslib order-0 tail)
    for (uint32_t k = 0; k < (n_out & 3u); ++k)
      out[out_end + k] = lookup[R[k] & (TOTFREQ - 1)];
    return true;
  }
  if (order != 1) return false;
  // order 1: per-context tables
  std::vector<uint32_t> Fs(256 * 256, 0), Cs(257 * 256, 0);
  std::vector<uint8_t> Ls((size_t)TOTFREQ * 256, 0);
  std::vector<uint8_t> have(256, 0);
  int ctx = st.u8();
  int rle = 0;
  while (!st.err) {
    if (ctx < 0 || ctx > 255) return false;
    if (!rans_read_table(st, &Fs[256 * ctx], &Cs[257 * ctx],
                         &Ls[(size_t)TOTFREQ * ctx], true))
      return false;
    have[ctx] = 1;
    if (rle > 0) {
      rle--;
      ctx++;
    } else {
      int nxt = st.u8();
      if (nxt == ctx + 1) rle = st.u8();
      ctx = nxt;
      if (ctx == 0) break;
    }
  }
  if (st.err) return false;
  uint32_t R[4];
  for (int j = 0; j < 4; ++j) R[j] = st.u32le();
  if (st.err) return false;
  const uint8_t* buf = st.p;
  int64_t pos = st.pos, blen = st.len;
  // FLOOR quarters; stream 3 continues through the tail (htslib layout)
  uint32_t n4 = n_out >> 2;
  int64_t idx[4] = {0, n4, 2 * (int64_t)n4, 3 * (int64_t)n4};
  int last[4] = {0, 0, 0, 0};
  for (uint32_t step = 0; step < n4; ++step) {
    for (int j = 0; j < 4; ++j) {
      uint32_t r = R[j];
      uint32_t m = r & (TOTFREQ - 1);
      int c = last[j];
      uint8_t s = Ls[(size_t)TOTFREQ * c + m];
      out[idx[j]] = s;
      r = Fs[256 * c + s] * (r >> TF) + m - Cs[257 * c + s];
      while (r < RANS_LOW && pos < blen) r = (r << 8) | buf[pos++];
      R[j] = r;
      last[j] = s;
      idx[j]++;
    }
  }
  {
    uint32_t r = R[3];
    int c = last[3];
    for (int64_t i = 4 * (int64_t)n4; i < (int64_t)n_out; ++i) {
      uint32_t m = r & (TOTFREQ - 1);
      uint8_t s = Ls[(size_t)TOTFREQ * c + m];
      out[i] = s;
      r = Fs[256 * c + s] * (r >> TF) + m - Cs[257 * c + s];
      while (r < RANS_LOW && pos < blen) r = (r << 8) | buf[pos++];
      c = s;
    }
  }
  return true;
}

static bool gzip_inflate(const uint8_t* in, int64_t in_len,
                         std::vector<uint8_t>& out, int64_t raw_size) {
  out.resize(raw_size > 0 ? raw_size : 1 << 16);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(in);
  zs.avail_in = (uInt)in_len;
  size_t total = 0;
  int rc;
  for (;;) {
    if (total == out.size()) out.resize(out.size() * 2);
    zs.next_out = out.data() + total;
    zs.avail_out = (uInt)(out.size() - total);
    rc = inflate(&zs, Z_NO_FLUSH);
    total = zs.total_out;
    if (rc == Z_STREAM_END) break;
    if (rc != Z_OK && rc != Z_BUF_ERROR) { inflateEnd(&zs); return false; }
    if (rc == Z_BUF_ERROR && zs.avail_in == 0 && zs.avail_out > 0) {
      inflateEnd(&zs);
      return false;
    }
  }
  inflateEnd(&zs);
  out.resize(total);
  return true;
}

// ------------------------------------------------------------- encodings
struct Enc {
  int codec = 0;
  // EXTERNAL / BYTE_ARRAY_STOP
  int64_t content_id = -1;
  int stop_byte = 0;
  // HUFFMAN (canonical): sorted (bitlen, code) -> symbol
  std::vector<int64_t> alphabet, bitlens;
  std::unordered_map<uint64_t, int64_t> huff;
  int max_len = 0;
  bool has_const = false;
  int64_t const_val = 0;
  // BETA / SUBEXP / GAMMA
  int64_t offset = 0, length = 0, k = 0;
  // BYTE_ARRAY_LEN
  int len_enc = -1, val_enc = -1;  // indices into the pool
  // per-slice resolved external stream (avoids a hash lookup per symbol)
  void* es = nullptr;
};

struct Ctx;
static int parse_encoding(Ctx& cx, BS& st);

struct ExtStream {
  const uint8_t* p = nullptr;
  int64_t len = 0;
  int64_t pos = 0;
};

struct Ctx {
  std::vector<Enc> pool;
  std::unordered_map<uint32_t, int> series;    // 2-char key -> pool idx
  std::unordered_map<int64_t, int> tag_enc;    // (t0<<16|t1<<8|type) -> idx
  std::vector<std::vector<uint32_t>> tag_dict; // per TL: packed tag keys
  bool rn = true, ap_delta = true;
  uint8_t sub_matrix[5] = {0, 0, 0, 0, 0};
  char sub_lut[5][4];
  BitS core{nullptr, 0};
  std::unordered_map<int64_t, ExtStream> ext;
  bool err = false;
  int err_code = 0;

  Enc& E(int i) { return pool[i]; }
};

static int parse_encoding(Ctx& cx, BS& st) {
  int idx = (int)cx.pool.size();
  cx.pool.emplace_back();
  int codec = (int)st.itf8();
  int64_t nargs = st.itf8();
  const uint8_t* args = st.take(nargs);
  if (st.err || !args) { cx.err = true; return idx; }
  BS as{args, nargs};
  Enc e;
  e.codec = codec;
  switch (codec) {
    case 0: break;                       // NULL
    case 1: e.content_id = as.itf8(); break;
    case 3: {                            // canonical HUFFMAN
      int64_t n = as.itf8();
      for (int64_t i = 0; i < n; ++i) e.alphabet.push_back(as.itf8());
      int64_t m = as.itf8();
      for (int64_t i = 0; i < m; ++i) e.bitlens.push_back(as.itf8());
      std::vector<std::pair<int64_t, int64_t>> pairs;
      for (size_t i = 0; i < e.alphabet.size() && i < e.bitlens.size(); ++i)
        pairs.emplace_back(e.bitlens[i], e.alphabet[i]);
      std::sort(pairs.begin(), pairs.end());
      uint64_t code = 0;
      int64_t prev_len = 0;
      for (auto& pr : pairs) {
        code <<= (pr.first - prev_len);
        e.huff[((uint64_t)pr.first << 40) | code] = pr.second;
        code += 1;
        prev_len = pr.first;
      }
      e.max_len = pairs.empty() ? 0 : (int)pairs.back().first;
      if (e.alphabet.size() == 1 && e.bitlens.size() == 1 &&
          e.bitlens[0] == 0) {
        e.has_const = true;
        e.const_val = e.alphabet[0];
      }
      break;
    }
    case 4: {                            // BYTE_ARRAY_LEN
      cx.pool[idx] = e;                  // placeholder before recursion
      int le = parse_encoding(cx, as);
      int ve = parse_encoding(cx, as);
      cx.pool[idx].len_enc = le;
      cx.pool[idx].val_enc = ve;
      cx.pool[idx].codec = 4;
      if (as.err) cx.err = true;
      return idx;
    }
    case 5:
      e.stop_byte = as.u8();
      e.content_id = as.itf8();
      break;
    case 6:
      e.offset = as.itf8();
      e.length = as.itf8();
      break;
    case 7:
      e.offset = as.itf8();
      e.k = as.itf8();
      break;
    case 9: e.offset = as.itf8(); break;
    default:
      cx.err = true;
      cx.err_code = -20;  // unsupported codec -> python fallback
      break;
  }
  if (as.err) cx.err = true;
  cx.pool[idx] = e;
  return idx;
}

static int64_t read_int(Ctx& cx, int ei);

static int64_t read_int(Ctx& cx, int ei) {
  Enc& e = cx.pool[ei];
  switch (e.codec) {
    case 1: {
      ExtStream* s = (ExtStream*)e.es;
      if (!s) { cx.err = true; return 0; }
      BS bs{s->p, s->len, s->pos};
      int64_t v = bs.itf8();
      if (bs.err) { cx.err = true; return 0; }
      s->pos = bs.pos;
      return v;
    }
    case 3: {
      if (e.has_const) return e.const_val;
      uint64_t code = 0;
      int blen = 0;
      for (;;) {
        code = (code << 1) | cx.core.bits(1);
        blen++;
        if (cx.core.err) { cx.err = true; return 0; }
        auto it = e.huff.find(((uint64_t)blen << 40) | code);
        if (it != e.huff.end()) return it->second;
        if (blen > e.max_len) { cx.err = true; return 0; }
      }
    }
    case 6:
      return (int64_t)cx.core.bits((int)e.length) - e.offset;
    case 9: {
      int n = 0;
      while (cx.core.bits(1) == 0) {
        if (cx.core.err) { cx.err = true; return 0; }
        n++;
      }
      int64_t v = 1;
      for (int i = 0; i < n; ++i) v = (v << 1) | cx.core.bits(1);
      return v - e.offset;
    }
    case 7: {
      int n = 0;
      while (cx.core.bits(1) == 1) {
        if (cx.core.err) { cx.err = true; return 0; }
        n++;
      }
      int64_t v;
      if (n == 0)
        v = cx.core.bits((int)e.k);
      else
        v = ((int64_t)1 << (n + e.k - 1)) | cx.core.bits((int)(n + e.k - 1));
      return v - e.offset;
    }
    default:
      cx.err = true;
      return 0;
  }
}

static int read_byte(Ctx& cx, int ei) {
  Enc& e = cx.pool[ei];
  if (e.codec == 1) {
    ExtStream* s = (ExtStream*)e.es;
    if (!s || s->pos >= s->len) { cx.err = true; return 0; }
    return s->p[s->pos++];
  }
  return (int)read_int(cx, ei);
}

// appends to out; n = byte count for fixed-length reads (-1: default 1)
static void read_bytes(Ctx& cx, int ei, int64_t n,
                       std::vector<uint8_t>& out) {
  Enc& e = cx.pool[ei];
  if (e.codec == 5) {
    ExtStream* s = (ExtStream*)e.es;
    if (!s) { cx.err = true; return; }
    const uint8_t* q = (const uint8_t*)std::memchr(s->p + s->pos,
                                                   e.stop_byte,
                                                   s->len - s->pos);
    if (!q) { cx.err = true; return; }
    out.insert(out.end(), s->p + s->pos, q);
    s->pos = (q - s->p) + 1;
    return;
  }
  if (e.codec == 4) {
    int64_t ln = read_int(cx, e.len_enc);
    if (cx.err || ln < 0) { cx.err = true; return; }
    Enc& v = cx.pool[e.val_enc];
    if (v.codec == 1) {
      ExtStream* s = (ExtStream*)v.es;
      if (!s || s->pos + ln > s->len) { cx.err = true; return; }
      out.insert(out.end(), s->p + s->pos, s->p + s->pos + ln);
      s->pos += ln;
    } else {
      for (int64_t i = 0; i < ln; ++i) out.push_back((uint8_t)read_byte(cx, e.val_enc));
    }
    return;
  }
  if (e.codec == 1) {
    int64_t ln = (n >= 0) ? n : 1;
    ExtStream* s = (ExtStream*)e.es;
    if (!s || s->pos + ln > s->len) { cx.err = true; return; }
    out.insert(out.end(), s->p + s->pos, s->p + s->pos + ln);
    s->pos += ln;
    return;
  }
  int64_t ln = (n >= 0) ? n : 1;
  for (int64_t i = 0; i < ln; ++i) out.push_back((uint8_t)read_byte(cx, ei));
}

static inline uint32_t skey(char a, char b) {
  return ((uint32_t)(uint8_t)a << 8) | (uint8_t)b;
}

// decoded record prior to BAM emission
struct CramRec {
  int64_t bf = 0, cf = 0, ref_id = -1, pos = 0, rl = 0, rg = -1;
  std::string name;
  int64_t mapq = 0, nf = -1, mate_ref = -1, mate_pos = -1, tlen = 0;
  std::vector<uint8_t> bases;   // unmapped path
  std::vector<uint8_t> quals;   // raw phred
  std::string seq;              // materialized
  std::vector<std::pair<int64_t, char>> cigar;  // (len, op)
  std::vector<uint8_t> tag_bytes;  // BAM-encoded aux data
  int64_t end_pos = 0;             // exclusive ref end
  int orig_index = 0;
};

struct Feature {
  char fc;
  int64_t fpos;
  int64_t ival = 0;
  std::vector<uint8_t> bytes;
};

static const uint8_t SEQ_NIBBLE[256] = {
    /* default 15 (N), set below via init fn */};

static uint8_t seq_nib(char c) {
  switch (c) {
    case '=': return 0;
    case 'A': case 'a': return 1;
    case 'C': case 'c': return 2;
    case 'M': case 'm': return 3;
    case 'G': case 'g': return 4;
    case 'R': case 'r': return 5;
    case 'S': case 's': return 6;
    case 'V': case 'v': return 7;
    case 'T': case 't': return 8;
    case 'W': case 'w': return 9;
    case 'Y': case 'y': return 10;
    case 'K': case 'k': return 11;
    case 'H': case 'h': return 12;
    case 'D': case 'd': return 13;
    case 'B': case 'b': return 14;
    default: return 15;
  }
}

static int cigar_op_code(char op) {
  switch (op) {
    case 'M': return 0;
    case 'I': return 1;
    case 'D': return 2;
    case 'N': return 3;
    case 'S': return 4;
    case 'H': return 5;
    case 'P': return 6;
    case '=': return 7;
    case 'X': return 8;
    default: return 0;
  }
}

}  // namespace

// Decode one container body (starting at its first block) into BAM record
// bodies.  Returns bytes written to out_blob, or a negative error code
// (python falls back to its object decoder):
//   -1 parse error, -2 output overflow (retry bigger), -3 unsupported
//   compression, -20 unsupported codec, -21 multi-ref slice,
//   -22 missing reference.
extern "C" int64_t cram_decode_container(
    const uint8_t* data, int64_t data_len, int32_t n_blocks,
    int32_t version_major,
    const char* refs_blob, const int64_t* refs_offs,
    const uint8_t* refs_avail, int32_t n_refs,
    const char* rg_blob, const int32_t* rg_offs, int32_t n_rg,
    uint8_t* out_blob, int64_t out_cap,
    int64_t* out_offs, int32_t* out_lens, int32_t max_recs,
    int32_t* n_out) {
  *n_out = 0;
  BS st{data, data_len};
  struct RawBlock {
    int method = 0, content_type = 0;
    int64_t content_id = 0;
    std::vector<uint8_t> data;
  };
  std::vector<RawBlock> blocks((size_t)n_blocks);
  for (int i = 0; i < n_blocks; ++i) {
    RawBlock& b = blocks[i];
    b.method = st.u8();
    b.content_type = st.u8();
    b.content_id = st.itf8();
    int64_t comp_size = st.itf8();
    int64_t raw_size = st.itf8();
    const uint8_t* raw = st.take(comp_size);
    if (st.err || !raw) return -1;
    switch (b.method) {
      case 0:
        b.data.assign(raw, raw + comp_size);
        break;
      case 1:
        if (!gzip_inflate(raw, comp_size, b.data, raw_size)) return -1;
        break;
      case 4:
        if (!rans4x8_decode(raw, comp_size, b.data)) return -1;
        break;
      default:
        return -3;  // bz2 / lzma / unknown -> python fallback
    }
    if (version_major >= 3) st.take(4);  // CRC32
    if (st.err) return -1;
  }
  if (blocks.empty() || blocks[0].content_type != 1) return -1;

  // ---- compression header ------------------------------------------------
  Ctx cx;
  {
    BS h{blocks[0].data.data(), (int64_t)blocks[0].data.size()};
    h.itf8();  // preservation map byte size
    cx.tag_dict.push_back({});  // default empty TL line
    bool td_seen = false;
    int64_t n_pres = h.itf8();
    for (int64_t i = 0; i < n_pres; ++i) {
      const uint8_t* key = h.take(2);
      if (!key || h.err) return -1;
      if (key[0] == 'R' && key[1] == 'N') {
        cx.rn = h.u8() != 0;
      } else if (key[0] == 'A' && key[1] == 'P') {
        cx.ap_delta = h.u8() != 0;
      } else if (key[0] == 'R' && key[1] == 'R') {
        h.u8();
      } else if (key[0] == 'S' && key[1] == 'M') {
        const uint8_t* sm = h.take(5);
        if (!sm) return -1;
        std::memcpy(cx.sub_matrix, sm, 5);
      } else if (key[0] == 'T' && key[1] == 'D') {
        int64_t blen = h.itf8();
        const uint8_t* blob = h.take(blen);
        if (h.err || !blob) return -1;
        // split on NUL; drop a single trailing empty piece (python's
        // endswith-\0 handling)
        cx.tag_dict.clear();
        int64_t start = 0;
        int64_t end_i = blen;
        if (blen > 0 && blob[blen - 1] == 0) end_i = blen - 1;
        std::vector<uint32_t> line;
        for (int64_t p2 = 0; p2 <= end_i; ++p2) {
          if (p2 == end_i || blob[p2] == 0) {
            line.clear();
            for (int64_t q = start; q + 3 <= p2; q += 3)
              line.push_back(((uint32_t)blob[q] << 16) |
                             ((uint32_t)blob[q + 1] << 8) | blob[q + 2]);
            cx.tag_dict.push_back(line);
            start = p2 + 1;
          }
        }
        if (cx.tag_dict.empty()) cx.tag_dict.push_back({});
        td_seen = true;
      } else {
        return -20;  // unknown preservation key -> python path raises too
      }
      if (h.err) return -1;
    }
    (void)td_seen;
    // data series encodings
    h.itf8();
    int64_t n_series = h.itf8();
    for (int64_t i = 0; i < n_series; ++i) {
      const uint8_t* key = h.take(2);
      if (!key || h.err) return -1;
      int idx = parse_encoding(cx, h);
      cx.series[skey((char)key[0], (char)key[1])] = idx;
    }
    // tag encodings
    h.itf8();
    int64_t n_tags = h.itf8();
    for (int64_t i = 0; i < n_tags; ++i) {
      int64_t key = h.itf8();
      int idx = parse_encoding(cx, h);
      cx.tag_enc[key] = idx;
    }
    if (h.err || cx.err) return cx.err_code ? cx.err_code : -1;
    // substitution LUT
    const char bases[6] = "ACGTN";
    for (int ri = 0; ri < 5; ++ri) {
      uint8_t row = cx.sub_matrix[ri];
      int k2 = 0;
      for (int bi = 0; bi < 5; ++bi) {
        if (bi == ri) continue;
        int code = (row >> (2 * (3 - k2))) & 3;
        cx.sub_lut[ri][code] = bases[bi];
        k2++;
      }
    }
  }

  auto series_idx = [&](char a, char b) -> int {
    auto it = cx.series.find(skey(a, b));
    return it == cx.series.end() ? -1 : it->second;
  };
  // resolve every data-series encoding index once (a hash lookup per
  // record field showed up at ~10% in the container profile)
  struct SeriesIdx {
    int BF, CF, RI, RL, AP, RG, RN, MF, NS, NP, TS, NF, TL, FN, FC, FP,
        BSs, BA, QS, IN, SC, DL, HC, PD, RS, BB, QQ, MQ;
  } S_;
  S_.BF = series_idx('B', 'F');
  S_.CF = series_idx('C', 'F');
  S_.RI = series_idx('R', 'I');
  S_.RL = series_idx('R', 'L');
  S_.AP = series_idx('A', 'P');
  S_.RG = series_idx('R', 'G');
  S_.RN = series_idx('R', 'N');
  S_.MF = series_idx('M', 'F');
  S_.NS = series_idx('N', 'S');
  S_.NP = series_idx('N', 'P');
  S_.TS = series_idx('T', 'S');
  S_.NF = series_idx('N', 'F');
  S_.TL = series_idx('T', 'L');
  S_.FN = series_idx('F', 'N');
  S_.FC = series_idx('F', 'C');
  S_.FP = series_idx('F', 'P');
  S_.BSs = series_idx('B', 'S');
  S_.BA = series_idx('B', 'A');
  S_.QS = series_idx('Q', 'S');
  S_.IN = series_idx('I', 'N');
  S_.SC = series_idx('S', 'C');
  S_.DL = series_idx('D', 'L');
  S_.HC = series_idx('H', 'C');
  S_.PD = series_idx('P', 'D');
  S_.RS = series_idx('R', 'S');
  S_.BB = series_idx('B', 'B');
  S_.QQ = series_idx('Q', 'Q');
  S_.MQ = series_idx('M', 'Q');
  auto rint_i = [&](int ei) -> int64_t {
    if (ei < 0) { cx.err = true; return 0; }
    return read_int(cx, ei);
  };

  // ---- slices ------------------------------------------------------------
  std::vector<CramRec> all;
  int bi = 1;
  while (bi < n_blocks) {
    if (blocks[bi].content_type != 2) return -1;
    BS sh{blocks[bi].data.data(), (int64_t)blocks[bi].data.size()};
    int64_t s_ref_id = sh.itf8();
    int64_t s_start = sh.itf8();
    sh.itf8();  // span
    int64_t s_nrec = sh.itf8();
    int64_t s_counter = sh.ltf8();
    int64_t s_nblocks = sh.itf8();
    int64_t n_ids = sh.itf8();
    for (int64_t i = 0; i < n_ids; ++i) sh.itf8();
    int64_t embedded_ref_id = sh.itf8();
    if (sh.err) return -1;
    const bool multi_ref = (s_ref_id == -2);

    cx.core = BitS{nullptr, 0};
    cx.ext.clear();
    const char* emb_ref = nullptr;
    int64_t emb_len = 0;
    int64_t emb_off = 0;
    for (int64_t k2 = 1; k2 <= s_nblocks && bi + k2 < n_blocks; ++k2) {
      RawBlock& b = blocks[bi + k2];
      if (b.content_type == 5) {
        cx.core = BitS{b.data.data(), (int64_t)b.data.size()};
      } else if (b.content_type == 4) {
        cx.ext[b.content_id] = ExtStream{b.data.data(),
                                         (int64_t)b.data.size(), 0};
        if (embedded_ref_id >= 0 && b.content_id == embedded_ref_id) {
          emb_ref = (const char*)b.data.data();
          emb_len = (int64_t)b.data.size();
          emb_off = s_start - 1;
        }
      }
    }

    // resolve each encoding's external stream once per slice
    for (Enc& e : cx.pool)
      e.es = (e.codec == 1 || e.codec == 5)
                 ? (cx.ext.count(e.content_id) ? &cx.ext[e.content_id]
                                               : nullptr)
                 : nullptr;

    size_t slice_first = all.size();
    int64_t last_pos = s_start;
    std::vector<Feature> feats;
    std::vector<uint8_t> tmp;
    for (int64_t ri = 0; ri < s_nrec; ++ri) {
      CramRec r;
      r.orig_index = (int)all.size();
      r.bf = rint_i(S_.BF);
      r.cf = rint_i(S_.CF);
      r.ref_id = s_ref_id;
      if (multi_ref) r.ref_id = rint_i(S_.RI);
      r.rl = rint_i(S_.RL);
      if (cx.ap_delta) {
        r.pos = last_pos + rint_i(S_.AP);
        last_pos = r.pos;
      } else {
        r.pos = rint_i(S_.AP);
      }
      r.rg = rint_i(S_.RG);
      if (cx.err) return cx.err_code ? cx.err_code : -1;
      if (cx.rn) {
        tmp.clear();
        int ei = S_.RN;
        if (ei < 0) return -1;
        read_bytes(cx, ei, -1, tmp);
        r.name.assign((const char*)tmp.data(), tmp.size());
      } else {
        char nb[32];
        std::snprintf(nb, sizeof(nb), "cram-%lld",
                      (long long)(s_counter + ri));
        r.name = nb;
      }
      if (r.cf & 0x2) {  // detached
        int64_t mf = rint_i(S_.MF);
        if (!cx.rn) {
          tmp.clear();
          int ei = S_.RN;
          if (ei < 0) return -1;
          read_bytes(cx, ei, -1, tmp);
          r.name.assign((const char*)tmp.data(), tmp.size());
        }
        r.mate_ref = rint_i(S_.NS);
        r.mate_pos = rint_i(S_.NP);
        r.tlen = rint_i(S_.TS);
        if (mf & 0x1) r.bf |= 0x20;
        if (mf & 0x2) r.bf |= 0x8;
      } else if (r.cf & 0x4) {
        r.nf = rint_i(S_.NF);
      }

      int64_t tl = rint_i(S_.TL);
      if (cx.err) return cx.err_code ? cx.err_code : -1;
      if (tl < 0 || tl >= (int64_t)cx.tag_dict.size()) return -1;
      bool has_rg_tag = false;
      for (uint32_t tkey : cx.tag_dict[tl]) {
        char t0 = (char)(tkey >> 16), t1 = (char)((tkey >> 8) & 0xFF);
        char type = (char)(tkey & 0xFF);
        auto it = cx.tag_enc.find((int64_t)tkey);
        if (it == cx.tag_enc.end()) return -1;
        tmp.clear();
        read_bytes(cx, it->second, -1, tmp);
        if (cx.err) return -1;
        if (t0 == 'R' && t1 == 'G') has_rg_tag = true;
        r.tag_bytes.push_back((uint8_t)t0);
        r.tag_bytes.push_back((uint8_t)t1);
        r.tag_bytes.push_back((uint8_t)type);
        if (type == 'Z' || type == 'H') {
          // normalize to exactly one trailing NUL (python rstrips)
          size_t n = tmp.size();
          while (n > 0 && tmp[n - 1] == 0) n--;
          r.tag_bytes.insert(r.tag_bytes.end(), tmp.begin(),
                             tmp.begin() + n);
          r.tag_bytes.push_back(0);
        } else {
          r.tag_bytes.insert(r.tag_bytes.end(), tmp.begin(), tmp.end());
        }
      }
      if (r.rg >= 0 && !has_rg_tag) {
        r.tag_bytes.push_back('R');
        r.tag_bytes.push_back('G');
        r.tag_bytes.push_back('Z');
        if (r.rg < n_rg) {
          const char* s = rg_blob + rg_offs[r.rg];
          const char* e = rg_blob + rg_offs[r.rg + 1];
          r.tag_bytes.insert(r.tag_bytes.end(), s, e);
        } else {
          char nb[16];
          std::snprintf(nb, sizeof(nb), "%d", (int)r.rg);
          r.tag_bytes.insert(r.tag_bytes.end(), nb, nb + std::strlen(nb));
        }
        r.tag_bytes.push_back(0);
      }

      if (!(r.bf & 0x4)) {  // mapped: features
        int64_t fn = rint_i(S_.FN);
        if (cx.err) return -1;
        feats.clear();
        int64_t fpos = 0;
        for (int64_t fi = 0; fi < fn; ++fi) {
          Feature f;
          int ei = S_.FC;
          if (ei < 0) return -1;
          f.fc = (char)read_byte(cx, ei);
          fpos += rint_i(S_.FP);
          f.fpos = fpos;
          switch (f.fc) {
            case 'X': f.ival = read_byte(cx, S_.BSs); break;
            case 'B':
              f.ival = read_byte(cx, S_.BA);
              read_byte(cx, S_.QS);
              break;
            case 'I': read_bytes(cx, S_.IN, -1, f.bytes); break;
            case 'S': read_bytes(cx, S_.SC, -1, f.bytes); break;
            case 'i': f.ival = read_byte(cx, S_.BA); break;
            case 'D': f.ival = rint_i(S_.DL); break;
            case 'H': f.ival = rint_i(S_.HC); break;
            case 'P': f.ival = rint_i(S_.PD); break;
            case 'N': f.ival = rint_i(S_.RS); break;
            case 'Q': f.ival = read_byte(cx, S_.QS); break;
            case 'b': read_bytes(cx, S_.BB, -1, f.bytes); break;
            case 'q': read_bytes(cx, S_.QQ, -1, f.bytes); break;
            default: return -20;
          }
          if (cx.err) return -1;
          feats.push_back(std::move(f));
        }
        r.mapq = rint_i(S_.MQ);
        if (r.cf & 0x1) {
          if (S_.QS < 0) return -1;
          read_bytes(cx, S_.QS, r.rl, r.quals);
        }
        if (cx.err) return -1;

        // resolve this record's reference sequence
        const char* eref = nullptr;
        int64_t eref_len = 0;
        int64_t ref_off = 0;
        if (emb_ref) {
          eref = emb_ref;
          eref_len = emb_len;
          ref_off = emb_off;
        } else if (r.ref_id >= 0) {
          if (r.ref_id >= n_refs || !refs_avail[r.ref_id]) return -22;
          eref = refs_blob + refs_offs[r.ref_id];
          eref_len = refs_offs[r.ref_id + 1] - refs_offs[r.ref_id];
        }
        // materialize sequence + cigar from features
        std::stable_sort(feats.begin(), feats.end(),
                         [](const Feature& a, const Feature& b2) {
                           return a.fpos < b2.fpos;
                         });
        r.seq.assign((size_t)r.rl, 'N');
        int64_t read_i = 0;
        int64_t ref_i = r.pos - 1;  // 0-based
        auto emit = [&](char op, int64_t length) {
          if (length <= 0) return;
          if (!r.cigar.empty() && r.cigar.back().second == op)
            r.cigar.back().first += length;
          else
            r.cigar.emplace_back(length, op);
        };
        auto ref_at = [&](int64_t p2) -> char {
          int64_t q = p2 - ref_off;
          if (q >= 0 && q < eref_len && eref) return eref[q];
          return 'N';
        };
        for (Feature& f : feats) {
          int64_t gap = (f.fpos - 1) - read_i;
          if (gap > 0) {
            if (read_i + gap > r.rl) return -1;
            for (int64_t k2 = 0; k2 < gap; ++k2)
              r.seq[read_i + k2] = ref_at(ref_i + k2);
            emit('M', gap);
            read_i += gap;
            ref_i += gap;
          }
          switch (f.fc) {
            case 'X': {
              if (read_i >= r.rl) return -1;
              char rb = ref_at(ref_i);
              int row;
              switch (rb) {
                case 'A': row = 0; break;
                case 'C': row = 1; break;
                case 'G': row = 2; break;
                case 'T': row = 3; break;
                default: row = 4; break;
              }
              r.seq[read_i] = (f.ival >= 0 && f.ival < 4)
                                  ? cx.sub_lut[row][f.ival] : 'N';
              emit('M', 1);
              read_i++;
              ref_i++;
              break;
            }
            case 'B':
              if (read_i >= r.rl) return -1;
              r.seq[read_i] = (char)f.ival;
              emit('M', 1);
              read_i++;
              ref_i++;
              break;
            case 'I':
              if (read_i + (int64_t)f.bytes.size() > r.rl) return -1;
              for (size_t k2 = 0; k2 < f.bytes.size(); ++k2)
                r.seq[read_i + k2] = (char)f.bytes[k2];
              emit('I', (int64_t)f.bytes.size());
              read_i += (int64_t)f.bytes.size();
              break;
            case 'i':
              if (read_i >= r.rl) return -1;
              r.seq[read_i] = (char)f.ival;
              emit('I', 1);
              read_i++;
              break;
            case 'S':
              if (read_i + (int64_t)f.bytes.size() > r.rl) return -1;
              for (size_t k2 = 0; k2 < f.bytes.size(); ++k2)
                r.seq[read_i + k2] = (char)f.bytes[k2];
              emit('S', (int64_t)f.bytes.size());
              read_i += (int64_t)f.bytes.size();
              break;
            case 'D': emit('D', f.ival); ref_i += f.ival; break;
            case 'N': emit('N', f.ival); ref_i += f.ival; break;
            case 'H': emit('H', f.ival); break;
            case 'P': emit('P', f.ival); break;
            case 'Q': break;
            case 'b':
              if (read_i + (int64_t)f.bytes.size() > r.rl) return -1;
              for (size_t k2 = 0; k2 < f.bytes.size(); ++k2)
                r.seq[read_i + k2] = (char)f.bytes[k2];
              emit('M', (int64_t)f.bytes.size());
              read_i += (int64_t)f.bytes.size();
              ref_i += (int64_t)f.bytes.size();
              break;
            case 'q': break;
            default: return -20;
          }
        }
        int64_t tail = r.rl - read_i;
        if (tail > 0) {
          for (int64_t k2 = 0; k2 < tail; ++k2)
            r.seq[read_i + k2] = ref_at(ref_i + k2);
          emit('M', tail);
        }
        if (r.cigar.empty()) r.cigar.emplace_back(r.rl, 'M');
      } else {  // unmapped
        if (S_.BA < 0) return -1;
        read_bytes(cx, S_.BA, r.rl, r.bases);
        if (r.cf & 0x1) {
          if (S_.QS < 0) return -1;
          read_bytes(cx, S_.QS, r.rl, r.quals);
        }
        if (cx.err) return -1;
        r.seq.assign((const char*)r.bases.data(), r.bases.size());
      }
      // exclusive reference end from the cigar
      r.end_pos = r.pos - 1;
      for (auto& ce : r.cigar) {
        char op = ce.second;
        if (op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X')
          r.end_pos += ce.first;
      }
      all.push_back(std::move(r));
    }

    // resolve NF mate chains within the slice
    for (size_t i = slice_first; i < all.size(); ++i) {
      CramRec& r = all[i];
      if (r.nf >= 0) {
        size_t j = i + (size_t)r.nf + 1;
        if (j < all.size()) {
          CramRec& m = all[j];
          r.mate_ref = m.ref_id;
          r.mate_pos = m.pos - 1;
          if (m.bf & 0x10) r.bf |= 0x20;
          m.mate_ref = r.ref_id;
          m.mate_pos = r.pos - 1;
          if (r.bf & 0x10) m.bf |= 0x20;
        }
      }
    }
    // template lengths for resolved same-name pairs (python by_name pass)
    {
      std::unordered_map<std::string, std::vector<size_t>> by_name;
      for (size_t i = slice_first; i < all.size(); ++i)
        if (all[i].bf & 0x1) by_name[all[i].name].push_back(i);
      for (auto& kv : by_name) {
        if (kv.second.size() != 2) continue;
        size_t ia = kv.second[0], ib = kv.second[1];
        if (all[ib].pos < all[ia].pos) std::swap(ia, ib);
        CramRec& a = all[ia];
        CramRec& b2 = all[ib];
        int64_t span = std::max(a.end_pos, b2.end_pos) - (a.pos - 1);
        if (a.tlen == 0) a.tlen = span;
        if (b2.tlen == 0) b2.tlen = -span;
      }
    }
    bi += 1 + (int)s_nblocks;
  }

  // sort by (ref_id, pos) as the python fetch path does
  std::vector<size_t> order(all.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](size_t a, size_t b2) {
    if (all[a].ref_id != all[b2].ref_id) return all[a].ref_id < all[b2].ref_id;
    if (all[a].pos != all[b2].pos) return all[a].pos < all[b2].pos;
    return a < b2;  // index tiebreak == stable order
  });

  // ---- emit BAM record bodies -------------------------------------------
  (void)SEQ_NIBBLE;
  int64_t w = 0;
  int32_t nrec = 0;
  for (size_t oi : order) {
    CramRec& r = all[oi];
    if (nrec >= max_recs) return -2;
    int64_t l_name = (int64_t)r.name.size() + 1;
    if (l_name > 255) return -1;
    int64_t l_seq = r.rl;
    int64_t n_cig = (r.bf & 0x4) ? 0 : (int64_t)r.cigar.size();
    if (n_cig > 65535) return -1;
    int64_t body = 32 + l_name + 4 * n_cig + (l_seq + 1) / 2 + l_seq +
                   (int64_t)r.tag_bytes.size();
    if (w + 4 + body > out_cap) return -2;
    uint8_t* o = out_blob + w;
    uint32_t bsz = (uint32_t)body;
    std::memcpy(o, &bsz, 4);
    o += 4;
    int32_t v32;
    v32 = (int32_t)r.ref_id; std::memcpy(o, &v32, 4);
    v32 = (int32_t)(r.pos - 1); std::memcpy(o + 4, &v32, 4);
    o[8] = (uint8_t)l_name;
    o[9] = (uint8_t)r.mapq;
    uint16_t v16 = 0;
    std::memcpy(o + 10, &v16, 2);       // bin (unused downstream)
    v16 = (uint16_t)n_cig; std::memcpy(o + 12, &v16, 2);
    v16 = (uint16_t)r.bf; std::memcpy(o + 14, &v16, 2);
    v32 = (int32_t)l_seq; std::memcpy(o + 16, &v32, 4);
    v32 = (int32_t)r.mate_ref; std::memcpy(o + 20, &v32, 4);
    v32 = (int32_t)r.mate_pos; std::memcpy(o + 24, &v32, 4);
    v32 = (int32_t)r.tlen; std::memcpy(o + 28, &v32, 4);
    uint8_t* q = o + 32;
    std::memcpy(q, r.name.data(), r.name.size());
    q[r.name.size()] = 0;
    q += l_name;
    for (int64_t ci = 0; ci < n_cig; ++ci) {
      uint32_t cv = ((uint32_t)r.cigar[ci].first << 4) |
                    cigar_op_code(r.cigar[ci].second);
      std::memcpy(q, &cv, 4);
      q += 4;
    }
    for (int64_t si = 0; si < l_seq; si += 2) {
      uint8_t hi = seq_nib(r.seq[si]);
      uint8_t lo = (si + 1 < l_seq) ? seq_nib(r.seq[si + 1]) : 0;
      *q++ = (uint8_t)((hi << 4) | lo);
    }
    if (r.quals.empty()) {
      // python materializes missing quals as 'I' (phred 40)
      std::memset(q, 40, l_seq);
      q += l_seq;
    } else {
      for (int64_t si = 0; si < l_seq; ++si)
        *q++ = (si < (int64_t)r.quals.size()) ? r.quals[si] : 40;
    }
    std::memcpy(q, r.tag_bytes.data(), r.tag_bytes.size());
    out_offs[nrec] = w + 4;
    out_lens[nrec] = (int32_t)body;
    nrec++;
    w += 4 + body;
  }
  *n_out = nrec;
  return w;
}
