// Batched BAM record decode + per-record filter cascade.
//
// The region pipeline's per-read preprocessing (record decode, quality-end
// trimming, adapter trimming, N/quality screens, haplotype-generation
// eligibility predicates, and the secondary region+-40 trim used by left
// alignment) runs here over a whole locus's record blob in one call,
// emitting columnar arrays.  Semantics are a literal port of
// hipstr_tpu/pipeline/{processor.read_and_filter_reads, bam_align.BamAlign,
// adapter_trimmer} (reference: src/bam_processor.cpp:173-474,
// src/bam_io.cpp TrimAlignment/TrimLowQualityEnds/TrimNumBases,
// src/alignment_filters.cpp, src/adapter_trimmer.cpp).  The stateful mate
// pairing / duplicate removal stays in Python, replaying these verdicts.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr const char SEQ_CODE[] = "=ACMGRSVTWYHKDBN";

struct Cig {
  int32_t n;
  char op;
};

constexpr int kMaxCig = 4096;

struct Rec {
  // decoded + mutable trimming state
  int32_t ref_id, mate_rid, flag, l_seq;
  int64_t orig_pos, mate_pos;
  int64_t pos, end_pos;
  const uint8_t* name;
  int32_t name_len;
  char seq[4096];
  char qual[4096];
  int32_t len;            // current seq length
  Cig cig[kMaxCig];
  int32_t ncig;
  // tags
  int32_t rg_off = 0, rg_len = 0, xa_off = 0, xa_len = 0, sa_off = 0,
          sa_len = 0;
  int32_t as_val = 0, xs_val = 0, hp_val = 0;
  uint8_t as_has = 0, xs_has = 0, hp_has = 0;
};

inline bool consumes_ref(char op) {
  return op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X';
}

// decode one BAM record body (post 4-byte size); returns false on overflow
static bool decode_rec(const uint8_t* b, int32_t blen, int64_t blob_base,
                       Rec* r) {
  // the caller reuses one Rec across records: reset the tag fields the
  // scan below only sets on presence
  r->rg_off = r->rg_len = r->xa_off = r->xa_len = r->sa_off = r->sa_len = 0;
  r->as_val = r->xs_val = r->hp_val = 0;
  r->as_has = r->xs_has = r->hp_has = 0;
  if (blen < 32) return false;
  auto rd32 = [&](int off) {
    int32_t v;
    std::memcpy(&v, b + off, 4);
    return v;
  };
  r->ref_id = rd32(0);
  r->orig_pos = rd32(4);
  const int l_name = b[8];
  const int n_cigar = b[12] | (b[13] << 8);
  r->flag = b[14] | (b[15] << 8);
  r->l_seq = rd32(16);
  r->mate_rid = rd32(20);
  r->mate_pos = rd32(24);
  if (r->l_seq >= 4096 || n_cigar > kMaxCig) return false;
  int off = 32;
  r->name = b + off;
  r->name_len = l_name - 1;
  off += l_name;
  r->ncig = n_cigar;
  int64_t ep = r->orig_pos;
  for (int k = 0; k < n_cigar; ++k) {
    uint32_t v;
    std::memcpy(&v, b + off + 4 * k, 4);
    r->cig[k].n = (int32_t)(v >> 4);
    r->cig[k].op = "MIDNSHP=X"[v & 0xf];
    if (consumes_ref(r->cig[k].op)) ep += r->cig[k].n;
  }
  off += 4 * n_cigar;
  r->pos = r->orig_pos;
  r->end_pos = ep;
  const int nb = (r->l_seq + 1) / 2;
  for (int k = 0; k < nb; ++k) {
    const uint8_t v = b[off + k];
    r->seq[2 * k] = SEQ_CODE[v >> 4];
    if (2 * k + 1 < r->l_seq) r->seq[2 * k + 1] = SEQ_CODE[v & 0xf];
  }
  off += nb;
  for (int k = 0; k < r->l_seq; ++k) {
    int q = b[off + k];
    r->qual[k] = (char)(std::min(93, q) + 33);
  }
  off += r->l_seq;
  r->len = r->l_seq;
  // tags: record blob offsets for RG/XA/SA, values for AS/XS/HP
  int i = off;
  while (i + 3 <= blen) {
    const char t0 = (char)b[i], t1 = (char)b[i + 1], tt = (char)b[i + 2];
    i += 3;
    int64_t val_off = blob_base + i;
    if (tt == 'Z' || tt == 'H') {
      int j = i;
      while (j < blen && b[j] != 0) ++j;
      if (t0 == 'R' && t1 == 'G') { r->rg_off = (int32_t)val_off; r->rg_len = j - i; }
      else if (t0 == 'X' && t1 == 'A') { r->xa_off = (int32_t)val_off; r->xa_len = j - i; }
      else if (t0 == 'S' && t1 == 'A') { r->sa_off = (int32_t)val_off; r->sa_len = j - i; }
      i = j + 1;
    } else if (tt == 'A' || tt == 'c' || tt == 'C') {
      int v = (tt == 'c') ? (int8_t)b[i] : b[i];
      if (t0 == 'A' && t1 == 'S') { r->as_val = v; r->as_has = 1; }
      else if (t0 == 'X' && t1 == 'S') { r->xs_val = v; r->xs_has = 1; }
      else if (t0 == 'H' && t1 == 'P') { r->hp_val = v; r->hp_has = 1; }
      i += 1;
    } else if (tt == 's' || tt == 'S') {
      int v = (tt == 's') ? (int16_t)(b[i] | (b[i + 1] << 8))
                          : (b[i] | (b[i + 1] << 8));
      if (t0 == 'A' && t1 == 'S') { r->as_val = v; r->as_has = 1; }
      else if (t0 == 'X' && t1 == 'S') { r->xs_val = v; r->xs_has = 1; }
      else if (t0 == 'H' && t1 == 'P') { r->hp_val = v; r->hp_has = 1; }
      i += 2;
    } else if (tt == 'i' || tt == 'I') {
      int32_t v;
      std::memcpy(&v, b + i, 4);
      if (t0 == 'A' && t1 == 'S') { r->as_val = v; r->as_has = 1; }
      else if (t0 == 'X' && t1 == 'S') { r->xs_val = v; r->xs_has = 1; }
      else if (t0 == 'H' && t1 == 'P') { r->hp_val = v; r->hp_has = 1; }
      i += 4;
    } else if (tt == 'f') {
      i += 4;
    } else if (tt == 'B') {
      const char sub = (char)b[i];
      uint32_t cnt;
      std::memcpy(&cnt, b + i + 1, 4);
      int esz = (sub == 'c' || sub == 'C') ? 1
                : (sub == 's' || sub == 'S') ? 2 : 4;
      i += 5 + (int)cnt * esz;
    } else {
      return false;  // unknown tag type: bail to the python path
    }
  }
  return true;
}

// TrimAlignment port (bam_align.py trim_alignment); min_base_qual as byte
static void trim_alignment(Rec* r, int64_t min_read_start,
                           int64_t max_read_stop, int min_base_qual,
                           int* out_ltrim = nullptr,
                           int* out_rtrim = nullptr) {
  int ltrim = 0;
  int64_t start_pos = r->pos;
  int ci = 0;
  while (start_pos < min_read_start && ci < r->ncig) {
    Cig& c = r->cig[ci];
    const char op = c.op;
    const bool consumes_read = (op == 'M' || op == '=' || op == 'X'
                                || op == 'I' || op == 'S');
    if (consumes_read && (uint8_t)r->qual[ltrim] > min_base_qual) break;
    if (op == 'M' || op == '=' || op == 'X') { ++ltrim; ++start_pos; }
    else if (op == 'D') ++start_pos;
    else if (op == 'I' || op == 'S') ++ltrim;
    // 'H': no-op
    if (c.n == 1) ++ci;
    else --c.n;
  }
  if (ci > 0) {
    std::memmove(r->cig, r->cig + ci, (r->ncig - ci) * sizeof(Cig));
    r->ncig -= ci;
  }

  int rtrim = 0;
  const int qlast = r->len - 1;
  int64_t end_pos = r->end_pos;
  while (end_pos > max_read_stop && r->ncig > 0) {
    Cig& c = r->cig[r->ncig - 1];
    const char op = c.op;
    const bool consumes_read = (op == 'M' || op == '=' || op == 'X'
                                || op == 'I' || op == 'S');
    if (consumes_read && (uint8_t)r->qual[qlast - rtrim] > min_base_qual)
      break;
    if (op == 'M' || op == '=' || op == 'X') { ++rtrim; --end_pos; }
    else if (op == 'D') --end_pos;
    else if (op == 'I' || op == 'S') ++rtrim;
    if (c.n == 1) --r->ncig;
    else --c.n;
  }

  r->pos = start_pos;
  r->end_pos = end_pos;
  const int nl = r->len - ltrim - rtrim;
  if (ltrim > 0 && nl > 0) {
    std::memmove(r->seq, r->seq + ltrim, nl);
    std::memmove(r->qual, r->qual + ltrim, nl);
  }
  r->len = std::max(0, nl);
  if (out_ltrim) *out_ltrim = ltrim;
  if (out_rtrim) *out_rtrim = rtrim;
}

// TrimNumBases port (adapter_trimmer._trim_num_bases)
static void trim_num_bases(Rec* r, int left, int right) {
  int n = left;
  int ci = 0;
  while (n > 0 && ci < r->ncig) {
    Cig& c = r->cig[ci];
    const char op = c.op;
    if (op == 'M' || op == '=' || op == 'X' || op == 'I' || op == 'S') {
      const int take = std::min(n, c.n);
      if (op == 'M' || op == '=' || op == 'X') r->pos += take;
      n -= take;
      if (take == c.n) ++ci;
      else c.n -= take;
    } else if (op == 'D') {
      r->pos += c.n;
      ++ci;
    } else {
      ++ci;  // H
    }
  }
  if (ci > 0) {
    std::memmove(r->cig, r->cig + ci, (r->ncig - ci) * sizeof(Cig));
    r->ncig -= ci;
  }
  n = right;
  while (n > 0 && r->ncig > 0) {
    Cig& c = r->cig[r->ncig - 1];
    const char op = c.op;
    if (op == 'M' || op == '=' || op == 'X' || op == 'I' || op == 'S') {
      const int take = std::min(n, c.n);
      if (op == 'M' || op == '=' || op == 'X') r->end_pos -= take;
      n -= take;
      if (take == c.n) --r->ncig;
      else c.n -= take;
    } else if (op == 'D') {
      r->end_pos -= c.n;
      --r->ncig;
    } else {
      --r->ncig;
    }
  }
  int lead = 0;
  while (lead < r->ncig && r->cig[lead].op == 'D') {
    r->pos += r->cig[lead].n;
    ++lead;
  }
  if (lead > 0) {
    std::memmove(r->cig, r->cig + lead, (r->ncig - lead) * sizeof(Cig));
    r->ncig -= lead;
  }
  while (r->ncig > 0 && r->cig[r->ncig - 1].op == 'D') {
    r->end_pos -= r->cig[r->ncig - 1].n;
    --r->ncig;
  }
  const int nl = r->len - left - right;
  if (left > 0 && nl > 0) {
    std::memmove(r->seq, r->seq + left, nl);
    std::memmove(r->qual, r->qual + left, nl);
  }
  r->len = std::max(0, nl);
}

// adapter index scans (adapter_trimmer._trim_three/five_prime_index)
static int mm_le1f(const char* a, const char* b, int n) {
  int mm = 0;
  for (int i = 0; i < n; ++i)
    if (a[i] != b[i] && ++mm > 1) return 2;
  return mm;
}

static int trim_three_prime_index(const char* bases, int read_len,
                                  const char* const* adapters,
                                  const int* alens, int n_ad,
                                  int min_overlap, double max_err) {
  int trim_index = read_len;
  for (int a = 0; a < n_ad; ++a) {
    const int alen = alens[a];
    for (int index = 0; index <= read_len - min_overlap; ++index) {
      const int max_match = std::min(alen, read_len - index);
      const int mm = mm_le1f(bases + index, adapters[a], max_match);
      if (mm == 0 || (mm == 1 && 1.0 / max_match < max_err)) {
        if (index < trim_index) trim_index = index;
        break;
      }
    }
  }
  return trim_index;
}

static int trim_five_prime_index(const char* bases, int read_len,
                                 const char* const* adapters,
                                 const int* alens, int n_ad,
                                 int min_overlap, double max_err) {
  int trim_index = -1;
  for (int a = 0; a < n_ad; ++a) {
    const int alen = alens[a];
    for (int index = read_len - 1; index >= min_overlap - 1; --index) {
      const int max_match = std::min(alen, index + 1);
      const int mm = mm_le1f(bases + index - max_match + 1,
                             adapters[a] + alen - max_match, max_match);
      if (mm == 0 || (mm == 1 && 1.0 / max_match < max_err)) {
        if (index > trim_index) trim_index = index;
        break;
      }
    }
  }
  return trim_index;
}

// GetEndDistToIndel port (bam_align.end_dist_to_indel walk)
static int walk_end_dist(const Cig* cig, int ncig, bool rev) {
  int i = 0;
  auto at = [&](int k) -> const Cig& { return rev ? cig[ncig - 1 - k]
                                                  : cig[k]; };
  if (i < ncig && at(i).op == 'H') ++i;
  if (i < ncig && at(i).op == 'S') ++i;
  int dist = 0;
  while (i < ncig) {
    const char op = at(i).op;
    if (op == 'M' || op == '=' || op == 'X') dist += at(i).n;
    else if (op == 'I' || op == 'D') return dist;
    else if (op == 'S' || op == 'H') return -1;
    else return -1;
    ++i;
  }
  return -1;
}

// ASCII-only lowercase: matches python str.lower() on base characters and
// avoids the locale-indirected std::tolower call in the per-base hot loops
struct LcTab {
  unsigned char t[256];
  LcTab() {
    for (int i = 0; i < 256; ++i)
      t[i] = (unsigned char)(i >= 'A' && i <= 'Z' ? i + 32 : i);
  }
};
static const LcTab kLc;
inline char lc(char c) { return (char)kLc.t[(unsigned char)c]; }

// GetNumEndMatches port; returns false on the python AssertionError paths
static bool num_end_matches(const Rec* r, const char* ref_seq,
                            int64_t ref_len, int* head, int* tail) {
  *head = -1;
  *tail = -1;
  if (r->pos < 0) return true;
  int read_index = 0;
  int64_t ref_index = r->pos;
  int ci = 0;
  bool beginning = true;
  int match_run = 0, head_match = 0;
  if (ci < r->ncig && r->cig[ci].op == 'H') ++ci;
  if (ci < r->ncig && r->cig[ci].op == 'S') {
    read_index += r->cig[ci].n;
    ++ci;
  }
  while (ci < r->ncig && ref_index < ref_len && read_index < r->len) {
    const int n = r->cig[ci].n;
    const char op = r->cig[ci].op;
    if (op == 'M' || op == '=' || op == 'X') {
      if (ref_index + n > ref_len) return true;  // (-1, -1)
      for (int k = 0; k < n; ++k) {
        if (lc(ref_seq[ref_index]) == lc(r->seq[read_index])) {
          ++match_run;
        } else {
          if (beginning) head_match = match_run;
          beginning = false;
          match_run = 0;
        }
        ++read_index;
        ++ref_index;
      }
    } else if (op == 'I') {
      if (beginning) head_match = match_run;
      beginning = false;
      match_run = 0;
      read_index += n;
    } else if (op == 'D') {
      if (beginning) head_match = match_run;
      beginning = false;
      match_run = 0;
      ref_index += n;
    } else if (op == 'S' || op == 'H') {
      break;
    } else {
      return false;
    }
    ++ci;
  }
  if (ci < r->ncig && r->cig[ci].op == 'S') {
    read_index += r->cig[ci].n;
    ++ci;
  }
  if (ci < r->ncig && r->cig[ci].op == 'H') ++ci;
  if (ci != r->ncig) {
    if (ref_index >= ref_len) return true;
    return false;  // improper CIGAR -> python raises
  }
  if (read_index != r->len) {
    if (ref_index >= ref_len) return true;
    return false;
  }
  if (beginning) {
    *head = match_run;
    *tail = match_run;
  } else {
    *head = head_match;
    *tail = match_run;
  }
  return true;
}

// HasLargestEndMatches port (bounded-window prefix/suffix match scans)
static bool has_largest_end_matches(const Rec* r, const char* ref_seq,
                                    int64_t ref_len, int max_external,
                                    int max_internal) {
  // unclipped info
  int start_index = 0, num_bases = 0;
  int64_t start = r->pos, end = r->pos - 1;
  bool begin = true;
  for (int k = 0; k < r->ncig; ++k) {
    const char op = r->cig[k].op;
    const int n = r->cig[k].n;
    if (op == 'D') { end += n; begin = false; }
    else if (op == 'H') {}
    else if (op == 'S') { if (begin) start_index += n; }
    else if (op == 'M' || op == '=' || op == 'X') {
      end += n; num_bases += n; begin = false;
    } else if (op == 'I') { num_bases += n; begin = false; }
    else return true;
  }
  const char* bases = r->seq + start_index;
  const int L = num_bases;

  // the aligned position's run is computed once; every other window
  // position only needs to be extended until it reaches that run length
  // (>= num => reject), which caps the scan at num instead of re-walking
  // the (usually full-read-length) match run 2x per position
  if (start >= 0 && start < ref_len) {
    const int64_t si = start;
    const int64_t lo = std::max<int64_t>(0, si - max_external);
    const int64_t hi = std::min<int64_t>(ref_len - 1, si + max_internal);
    int num = 0;
    while (num < L && si + num < ref_len &&
           lc(bases[num]) == lc(ref_seq[si + num]))
      ++num;
    for (int64_t i = lo; i <= hi; ++i) {
      if (i == si) continue;
      int a = 0;
      while (a < num && i + a < ref_len && lc(bases[a]) == lc(ref_seq[i + a]))
        ++a;
      if (a >= num) return false;
    }
  }
  if (end >= 0 && end < ref_len) {
    const int64_t ei = end;
    const int64_t lo = std::max<int64_t>(0, ei - max_internal);
    const int64_t hi = std::min<int64_t>(ref_len - 1, ei + max_external);
    int num = 0;
    while (num < L && ei - num >= 0 &&
           lc(bases[L - 1 - num]) == lc(ref_seq[ei - num]))
      ++num;
    for (int64_t i = lo; i <= hi; ++i) {
      if (i == ei) continue;
      int a = 0;
      while (a < num && i - a >= 0 &&
             lc(bases[L - 1 - a]) == lc(ref_seq[i - a]))
        ++a;
      if (a >= num) return false;
    }
  }
  return true;
}

// numpy-identical pairwise summation (numpy pairwise_sum, unroll 8,
// block 128): the qual-sum screen and the PCR-dedup quality compares were
// previously np.sum over a table gather; replicating the exact reduction
// tree keeps the native value bit-identical to both the python fast path
// it replaces and the object-path fallback.
static double np_pairwise_sum(const double* a, int64_t n) {
  if (n < 8) {
    double res = 0.0;
    for (int64_t i = 0; i < n; ++i) res += a[i];
    return res;
  }
  if (n <= 128) {
    double r0 = a[0], r1 = a[1], r2 = a[2], r3 = a[3];
    double r4 = a[4], r5 = a[5], r6 = a[6], r7 = a[7];
    int64_t i;
    for (i = 8; i < n - (n % 8); i += 8) {
      r0 += a[i + 0]; r1 += a[i + 1]; r2 += a[i + 2]; r3 += a[i + 3];
      r4 += a[i + 4]; r5 += a[i + 5]; r6 += a[i + 6]; r7 += a[i + 7];
    }
    double res = ((r0 + r1) + (r2 + r3)) + ((r4 + r5) + (r6 + r7));
    for (; i < n; ++i) res += a[i];
    return res;
  }
  int64_t n2 = n / 2;
  n2 -= n2 % 8;
  return np_pairwise_sum(a, n2) + np_pairwise_sum(a + n2, n - n2);
}

}  // namespace

// statuses for the python state machine (replayed in record order):
//   0 skip before the max-reads checkpoint (flag/pair/window rejects)
//   1 reached checkpoint, then silently skipped (pos==0 / empty cigar /
//     zero length / post-trim guards / adapter-emptied)
//   2 reached checkpoint, then skipped as HARD_CLIPPED (filt-bam reason)
//   4 alive: overlaps/pass flags + trimmed state are valid
extern "C" int32_t bam_filter_batch(
    const uint8_t* blob, int64_t blob_len,
    const int64_t* rec_off, const int32_t* rec_len, int32_t n,
    int64_t f_start, int64_t f_end,      // BAI fetch window screen
    int64_t g_start, int64_t g_stop, int32_t target_rid,
    int32_t qual_trim_ch,
    int64_t trim2_min_start, int64_t trim2_max_stop,
    const char* chrom_seq, int64_t chrom_len,
    int32_t min_flank, int32_t match_window, int32_t min_end_match,
    int32_t min_bp_before_indel, int32_t do_adapter_trim,
    const char* r1_fw0, const char* r1_fw1,
    const char* r2_fw0, const char* r2_fw1,
    const char* r1_rc0, const char* r1_rc1,
    const char* r2_rc0, const char* r2_rc1,
    int32_t adapter_len, int32_t min_overlap, double max_err,
    int32_t max_seq, int32_t max_cig,
    uint8_t* status, uint8_t* overlaps_out, uint8_t* has_n,
    uint8_t* p2_flank_ok, uint8_t* p2_largest_ok, uint8_t* p2_endmatch_ok,
    uint8_t* p2_indel_ok, uint8_t* rec_err,
    int32_t* flag_out, int32_t* ref_id_out, int32_t* mate_rid_out,
    int64_t* pos_out, int64_t* end_pos_out, int64_t* orig_pos_out,
    int64_t* mate_pos_out,
    int64_t* name_off, int32_t* name_len,
    uint8_t* seq_pool, uint8_t* qual_pool, int32_t* seq_len_out,
    uint8_t* cig_op_pool, int32_t* cig_n_pool, int32_t* n_cig_out,
    int64_t* pos2, int64_t* end2, int32_t* l2, int32_t* r2_out,
    uint8_t* cig2_op_pool, int32_t* cig2_n_pool, int32_t* n_cig2_out,
    uint8_t* matches_ref_out,
    int32_t* rg_off, int32_t* rg_len, int32_t* xa_off, int32_t* xa_len,
    int32_t* sa_off, int32_t* sa_len,
    int32_t* as_val, uint8_t* as_has, int32_t* xs_val, uint8_t* xs_has,
    int32_t* hp_val, uint8_t* hp_has,
    int32_t* adapter_trim_bases, uint8_t* adapter_class,
    const double* logc_table, double* qual_sum_out) {
  const char* r1_fw[2] = {r1_fw0, r1_fw1};
  const char* r2_fw[2] = {r2_fw0, r2_fw1};
  const char* r1_rc[2] = {r1_rc0, r1_rc1};
  const char* r2_rc[2] = {r2_rc0, r2_rc1};
  const int alens[2] = {adapter_len, adapter_len};

  Rec rec;
  for (int32_t i = 0; i < n; ++i) {
    status[i] = 0;
    rec_err[i] = 0;
    overlaps_out[i] = 0;
    adapter_trim_bases[i] = 0;
    adapter_class[i] = 0;
    Rec* r = &rec;
    if (!decode_rec(blob + rec_off[i], rec_len[i], rec_off[i], r)) {
      rec_err[i] = 1;
      continue;
    }
    // fetch-window screen (BamReader.fetch yield condition)
    if (r->ref_id != target_rid || r->orig_pos >= f_end ||
        r->end_pos <= f_start)
      continue;
    const int flag = r->flag;
    // flag screens (processor.read_and_filter_reads entry)
    if ((flag & 0x4) || (flag & 0x100) || (flag & 0x800) || (flag & 0x400) ||
        (flag & 0x200))
      continue;
    const bool paired = flag & 0x1;
    const bool first_mate = flag & 0x40;
    const bool second_mate = flag & 0x80;
    if (paired && !first_mate && !second_mate) continue;

    // window check on the original coordinates
    if (r->pos > g_stop || r->end_pos < g_start) {
      if (!paired || r->mate_pos == r->pos) continue;
      if (r->mate_pos > g_stop) continue;
      if (r->mate_pos + r->len + 100 < g_start) continue;
    }
    // reached the max-reads checkpoint
    status[i] = 1;
    if (r->orig_pos == 0 || r->ncig == 0 || r->len == 0) continue;

    bool overlaps = r->pos < g_stop && r->end_pos >= g_start;
    if (overlaps) {
      if (qual_trim_ch > ' ') {
        if (r->ncig > 0 && (r->cig[0].op == 'H' ||
                            r->cig[r->ncig - 1].op == 'H')) {
          status[i] = 2;  // HARD_CLIPPED
          continue;
        }
        const int length0 = r->len;
        trim_alignment(r, INT64_MAX, INT64_MIN, qual_trim_ch);
        if (r->pos < g_stop && r->end_pos >= g_start) {
          if (r->len == 0 || r->len < length0 / 2.0) {
            status[i] = 1;
            continue;
          }
        }
      }
      if (do_adapter_trim && r->len > 0) {
        const bool rev = flag & 0x10;
        if (first_mate || !paired) {
          adapter_class[i] = 1;
          if (rev) {
            const int idx = trim_five_prime_index(r->seq, r->len, r1_rc,
                                                  alens, 2, min_overlap,
                                                  max_err);
            if (idx >= 0) trim_num_bases(r, idx + 1, 0);
            adapter_trim_bases[i] = idx + 1;
          } else {
            const int idx = trim_three_prime_index(r->seq, r->len, r1_fw,
                                                   alens, 2, min_overlap,
                                                   max_err);
            const int nt = r->len - idx;
            if (nt > 0) trim_num_bases(r, 0, nt);
            adapter_trim_bases[i] = std::max(0, nt);
          }
        } else if (second_mate) {
          adapter_class[i] = 2;
          if (rev) {
            const int idx = trim_five_prime_index(r->seq, r->len, r2_rc,
                                                  alens, 2, min_overlap,
                                                  max_err);
            if (idx >= 0) trim_num_bases(r, idx + 1, 0);
            adapter_trim_bases[i] = idx + 1;
          } else {
            const int idx = trim_three_prime_index(r->seq, r->len, r2_fw,
                                                   alens, 2, min_overlap,
                                                   max_err);
            const int nt = r->len - idx;
            if (nt > 0) trim_num_bases(r, 0, nt);
            adapter_trim_bases[i] = std::max(0, nt);
          }
        }
      }
      if (r->ncig == 0 || r->len == 0) {
        status[i] = 1;
        continue;
      }
    }

    overlaps = r->pos < g_stop && r->end_pos >= g_start;
    status[i] = 4;
    overlaps_out[i] = overlaps ? 1 : 0;

    if (overlaps) {
      bool n_found = false;
      for (int k = 0; k < r->len; ++k)
        if (r->seq[k] == 'N') { n_found = true; break; }
      has_n[i] = n_found ? 1 : 0;
      // pass-two predicates (filters after pass_one; the qual-sum screen
      // itself is computed in python for bit-identical float semantics)
      bool ok = true;
      if (min_flank > 0 && (r->pos > g_start - min_flank ||
                            r->end_pos < g_stop + min_flank))
        ok = false;
      p2_flank_ok[i] = ok ? 1 : 0;
      if (match_window > 0) {
        p2_largest_ok[i] = has_largest_end_matches(
            r, chrom_seq, chrom_len, match_window, match_window) ? 1 : 0;
      } else {
        p2_largest_ok[i] = 1;
      }
      if (min_end_match > 0) {
        int h = -1, t = -1;
        if (!num_end_matches(r, chrom_seq, chrom_len, &h, &t)) {
          rec_err[i] = 2;  // python raises AssertionError here
          p2_endmatch_ok[i] = 0;
        } else {
          p2_endmatch_ok[i] = (h >= min_end_match && t >= min_end_match)
                                  ? 1 : 0;
        }
      } else {
        p2_endmatch_ok[i] = 1;
      }
      if (min_bp_before_indel > 0) {
        const int h = walk_end_dist(r->cig, r->ncig, false);
        const int t = walk_end_dist(r->cig, r->ncig, true);
        p2_indel_ok[i] = ((h != -1 && h < min_bp_before_indel) ||
                          (t != -1 && t < min_bp_before_indel)) ? 0 : 1;
      } else {
        p2_indel_ok[i] = 1;
      }
    } else {
      has_n[i] = 0;
      p2_flank_ok[i] = p2_largest_ok[i] = p2_endmatch_ok[i] =
          p2_indel_ok[i] = 0;
    }

    // emit primary trimmed state
    flag_out[i] = flag;
    ref_id_out[i] = r->ref_id;
    mate_rid_out[i] = r->mate_rid;
    pos_out[i] = r->pos;
    end_pos_out[i] = r->end_pos;
    orig_pos_out[i] = r->orig_pos;
    mate_pos_out[i] = r->mate_pos;
    name_off[i] = rec_off[i] + 32;
    name_len[i] = r->name_len;
    if (r->len > max_seq || r->ncig > max_cig) {
      rec_err[i] = 1;
      continue;
    }
    std::memcpy(seq_pool + (int64_t)i * max_seq, r->seq, r->len);
    std::memcpy(qual_pool + (int64_t)i * max_seq, r->qual, r->len);
    seq_len_out[i] = r->len;
    if (logc_table && qual_sum_out) {
      // base-quality screen sum over the trimmed qualities (python
      // previously summed a table gather per read; same tree, see
      // np_pairwise_sum)
      double tmp[4096];
      const int L = r->len;
      for (int k = 0; k < L; ++k) tmp[k] = logc_table[(uint8_t)r->qual[k]];
      qual_sum_out[i] = np_pairwise_sum(tmp, L);
    }
    for (int k = 0; k < r->ncig; ++k) {
      cig_op_pool[(int64_t)i * max_cig + k] = (uint8_t)r->cig[k].op;
      cig_n_pool[(int64_t)i * max_cig + k] = r->cig[k].n;
    }
    n_cig_out[i] = r->ncig;
    rg_off[i] = r->rg_off;
    rg_len[i] = r->rg_len;
    xa_off[i] = r->xa_off;
    xa_len[i] = r->xa_len;
    sa_off[i] = r->sa_off;
    sa_len[i] = r->sa_len;
    as_val[i] = r->as_val;
    as_has[i] = r->as_has;
    xs_val[i] = r->xs_val;
    xs_has[i] = r->xs_has;
    hp_val[i] = r->hp_val;
    hp_has[i] = r->hp_has;

    // secondary (left-alignment) trim: region window, positional only;
    // seq2/qual2 = primary[l2 : len - r2], so only the counts are emitted
    if (overlaps) {
      int lt = 0, rt = 0;
      trim_alignment(r, trim2_min_start, trim2_max_stop, '~', &lt, &rt);
      pos2[i] = r->pos;
      end2[i] = r->end_pos;
      l2[i] = lt;
      r2_out[i] = rt;
      n_cig2_out[i] = r->ncig;
      for (int k = 0; k < r->ncig; ++k) {
        cig2_op_pool[(int64_t)i * max_cig + k] = (uint8_t)r->cig[k].op;
        cig2_n_pool[(int64_t)i * max_cig + k] = r->cig[k].n;
      }
      bool mref = true;  // python all() semantics: empty CIGAR -> True
      for (int k = 0; k < r->ncig; ++k)
        if (r->cig[k].op != 'M' && r->cig[k].op != '=') { mref = false; break; }
      matches_ref_out[i] = mref ? 1 : 0;
    } else {
      pos2[i] = r->pos;
      end2[i] = r->end_pos;
      l2[i] = 0;
      r2_out[i] = 0;
      n_cig2_out[i] = -1;  // marker: no secondary state
      matches_ref_out[i] = 0;
    }
  }
  return 0;
}
