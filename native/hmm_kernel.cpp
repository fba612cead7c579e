// Per-(read, haplotype) stutter-aware forward DP, used by the host traceback
// path.  Fills the match/insert/delete matrices and the per-column best
// PCR-artifact summaries for one read segment against one realized haplotype.
//
// Semantics follow hipstr_tpu/align/hmm_reference.py (the project's parity
// oracle for reference src/SeqAlignment/HapAligner.cpp:26-161 and
// src/SeqAlignment/StutterAlignerClass.cpp); the haplotype arrives as flat
// row-metadata arrays so no structure marshalling is needed per call.

#include <cmath>
#include <cstdint>
#include <vector>
#include <algorithm>
#include <thread>

namespace {

constexpr double kImpossible = -1000000000.0;

inline double lse(const std::vector<double>& v) {
  double m = v[0];
  for (double x : v) m = std::max(m, x);
  double s = 0.0;
  for (double x : v) s += std::exp(x - m);
  return m + std::log(s);
}

// One stutter (repeat) block plus the read-dependent cumulative tables.
struct StutterBlock {
  const uint8_t* bseq;  // block chars, forward orientation of this segment
  int blen, period, left_align;
  int nD;
  const int32_t* art;   // artifact sizes, ascending
  const double* lpmf;   // per-artifact stutter log-PMF
  int n_ins, n_del;     // adjusted artifact counts (block-length capped)
  int max_ins, max_del_abs;
  // periodic upstream-match-run tables, one per deletion shift
  std::vector<std::vector<int32_t>> um;
  // per-read-offset cumulative emission tables
  std::vector<double> match_probs;  // [L]
  std::vector<double> ins_probs;    // [L * n_ins]
  std::vector<double> del_probs;    // [L * max(n_del,1)]

  inline uint8_t brev(int k) const { return bseq[blen - 1 - k]; }

  void init(const uint8_t* seq_, int blen_, int period_, int left_align_,
            int nD_, const int32_t* art_, const double* lpmf_,
            int rep_max_ins, int rep_max_del) {
    bseq = seq_; blen = blen_; period = period_; left_align = left_align_;
    nD = nD_; art = art_; lpmf = lpmf_;
    n_ins = rep_max_ins / period;
    n_del = -(rep_max_del / period);
    while (n_del * period > blen) n_del--;
    max_ins = period * n_ins;
    max_del_abs = period * n_del;
    int n_um = std::max(n_del, 1);
    um.assign(n_um, std::vector<int32_t>(blen, 0));
    for (int s = 0; s < n_um; ++s) {
      int shift = (s + 1) * period;
      for (int i = shift; i < blen; ++i)
        um[s][i] = (bseq[i - shift] != bseq[i]) ? 0 : 1 + um[s][i - 1];
    }
  }

  inline double sc(const uint8_t* seq, const double* blw, const double* blc,
                   int idx, uint8_t ch) const {
    return seq[idx] == ch ? blc[idx] : blw[idx];
  }

  // Reverse-cumulative per-offset tables (oracle load_read).
  void load_read(const uint8_t* seq, int L, const double* blw,
                 const double* blc) {
    match_probs.assign(L, 0.0);
    ins_probs.assign((size_t)L * std::max(n_ins, 1), 0.0);
    del_probs.assign((size_t)L * std::max(n_del, 1), 0.0);
    for (int o = 0; o < L; ++o) {
      double lp = 0.0;
      int j = 0;
      int lim1 = std::min(L - o, max_del_abs);
      for (; j < lim1; ++j) {
        lp += sc(seq, blw, blc, L - 1 - o - j, brev(j));
        if ((j + 1) % period == 0)
          del_probs[(size_t)o * std::max(n_del, 1) + (j + 1) / period - 1] = lp;
      }
      int lim2 = std::min(L - o, blen);
      for (; j < lim2; ++j) lp += sc(seq, blw, blc, L - 1 - o - j, brev(j));
      match_probs[o] = lp;

      double li = 0.0;
      j = 0;
      int lim3 = std::min(max_ins, L - o);
      for (; j < lim3; ++j) {
        if (j % period < blen)
          li += sc(seq, blw, blc, L - 1 - o - j, brev(j % period));
        else
          li += blc[L - 1 - o - j];
        if ((j + 1) % period == 0)
          ins_probs[(size_t)o * std::max(n_ins, 1) + (j + 1) / period - 1] = li;
      }
      for (; j < max_ins; ++j)
        if ((j + 1) % period == 0)
          ins_probs[(size_t)o * std::max(n_ins, 1) + (j + 1) / period - 1] = li;
    }
  }

  // PCR insertion of D bases; returns LL and writes the best (tie-broken)
  // artifact position.
  double ins_emission(const uint8_t* seq, int L, const double* blw,
                      const double* blc, int base_len, int j, int offset,
                      int D, int64_t* pos_out) const {
    static thread_local std::vector<double> probs;
    probs.clear();
    const std::vector<int32_t>& um0 = um[0];
    double lp = -std::log((double)(blen + 1))
              + ins_probs[(size_t)offset * std::max(n_ins, 1) + D / period - 1]
              + (base_len > D ? match_probs[offset + D] : 0.0);
    int best_pos = 0;
    double best = lp;
    probs.push_back(lp);
    int i = 0;
    int limit = -std::min(std::max(0, base_len - D), blen);
    while (i > limit) {
      if (-i + period < blen) {
        int um_i = um0[blen - 1 + i];
        if (um_i == 0) {
          for (int idx = i - period; idx >= i - D; idx -= period) {
            lp -= sc(seq, blw, blc, j + idx, brev(-i));
            lp += sc(seq, blw, blc, j + idx, brev(-i + period));
          }
          probs.push_back(lp);
        } else {
          probs.push_back(std::log((double)um_i) + lp);
          i -= (um_i - 1);
        }
      } else {
        probs.push_back(lp);
      }
      if (lp > best || (left_align && lp == best)) { best_pos = 1 - i; best = lp; }
      i -= 1;
    }
    if (i > -blen) probs.push_back(std::log((double)(blen + i)) + lp);
    if (pos_out) *pos_out = best_pos;
    return lse(probs);
  }

  // PCR deletion of |D| bases (D < 0).
  double del_emission(const uint8_t* seq, int L, const double* blw,
                      const double* blc, int base_len, int j, int offset,
                      int D, int64_t* pos_out) const {
    static thread_local std::vector<double> probs;
    probs.clear();
    const std::vector<int32_t>& umk = um[-D / period - 1];
    double lp = -std::log((double)(blen + D + 1));
    if (offset + D >= 0) {
      lp += match_probs[offset + D]
          - del_probs[(size_t)(offset + D) * std::max(n_del, 1) - D / period - 1];
    } else {
      for (int jj = 0; jj > -base_len; --jj)
        lp += sc(seq, blw, blc, j + jj, bseq[blen - 1 + jj + D]);
    }
    int best_pos = 0;
    double best = lp;
    probs.push_back(lp);
    int i = 0;
    while (i > -base_len) {
      int um_i = umk[blen - 1 + i];
      if (um_i == 0) {
        lp -= sc(seq, blw, blc, j + i, bseq[blen - 1 + i + D]);
        lp += sc(seq, blw, blc, j + i, bseq[blen - 1 + i]);
        probs.push_back(lp);
      } else {
        probs.push_back(std::log((double)um_i) + lp);
        i -= (um_i - 1);
      }
      if (lp > best || (left_align && lp == best)) { best_pos = 1 - i; best = lp; }
      i -= 1;
    }
    if (-i < blen + D) probs.push_back(std::log((double)(blen + D + i)) + lp);
    if (pos_out) *pos_out = best_pos;
    return lse(probs);
  }

  double emission(const uint8_t* seq, int L, const double* blw,
                  const double* blc, int j, int D, int64_t* pos_out) const {
    int offset = L - 1 - j;
    if (D == 0) {
      if (pos_out) *pos_out = -1;
      return match_probs[offset];
    }
    int base_len = std::min(blen + D, j + 1);
    if (D > 0) return ins_emission(seq, L, blw, blc, base_len, j, offset, D, pos_out);
    return del_emission(seq, L, blw, blc, base_len, j, offset, D, pos_out);
  }
};

}  // namespace

extern "C" int hmm_fill_dp(
    const uint8_t* seq, int32_t L, const double* blw, const double* blc,
    int32_t H, int32_t n_blocks,
    const uint8_t* row_kind,   // [H] 0 first,1 flank,2 forced-match,3 stutter-last,4 stutter-inner
    const uint8_t* row_char,   // [H] haplotype char for kinds 0-2
    const int32_t* row_homop,  // [H] homopolymer transition index for kind 1
    int32_t n_st,
    const int32_t* st_row, const int32_t* st_block,
    const uint8_t* st_seq_pool, const int32_t* st_off, const int32_t* st_len,
    const int32_t* st_period, const int32_t* st_max_ins,
    const int32_t* st_max_del, const int32_t* st_left_align,
    const int32_t* st_nD, const int32_t* st_art_off,
    const int32_t* art_sizes, const double* art_lpmf,
    const double* m2m, const double* m2i, const double* m2d,
    double i2i, double i2m, double d2d, double d2m,
    double* match, double* insert_m, double* delete_m,
    int64_t* best_art_size, int64_t* best_art_pos, double* out_left_prob) {
  static thread_local std::vector<double> C, Csh;
  C.resize((size_t)L); Csh.resize((size_t)L);
  double acc = 0.0;
  for (int j = 0; j < L; ++j) { Csh[j] = acc; acc += blc[j]; C[j] = acc; }
  *out_left_prob = C[L - 1];

  std::vector<StutterBlock> blocks((size_t)n_st);
  for (int s = 0; s < n_st; ++s) {
    blocks[s].init(st_seq_pool + st_off[s], st_len[s], st_period[s],
                   st_left_align[s], st_nD[s], art_sizes + st_art_off[s],
                   art_lpmf + st_art_off[s], st_max_ins[s], st_max_del[s]);
    blocks[s].load_read(seq, L, blw, blc);
  }

  int st_cursor = 0;
  for (int r = 0; r < H; ++r) {
    double* M = match + (size_t)r * L;
    double* I = insert_m + (size_t)r * L;
    double* Dl = delete_m + (size_t)r * L;
    int kind = row_kind[r];
    if (kind == 4) continue;  // inner stutter row: never read
    if (kind == 0) {
      uint8_t ch = row_char[r];
      for (int j = 0; j < L; ++j) {
        M[j] = (seq[j] == ch ? blc[j] : blw[j]) + Csh[j];
        I[j] = C[j];
        Dl[j] = kImpossible;
      }
      continue;
    }
    if (kind == 3) {
      // last row of a stutter block: logsumexp over artifact sizes of
      // lpmf + block emission + upstream match entry
      while (st_cursor < n_st && st_row[st_cursor] != r) st_cursor++;
      const StutterBlock& B = blocks[st_cursor];
      int bi = st_block[st_cursor];
      const double* Mp = match + (size_t)(r - B.blen) * L;
      int64_t* bas = best_art_size + (size_t)bi * L;
      int64_t* bap = best_art_pos + (size_t)bi * L;
      static thread_local std::vector<double> all;
      static thread_local std::vector<int64_t> allpos;
      all.assign((size_t)B.nD * L, kImpossible);
      allpos.assign((size_t)B.nD * L, -1);
      for (int ai = 0; ai < B.nD; ++ai) {
        int D = B.art[ai];
        if (B.blen + D < 0) continue;
        int shift = B.blen + D;
        for (int j = 0; j < L; ++j) {
          double pre = (j - shift >= 0) ? Mp[j - shift] : 0.0;
          int64_t pos = -1;   // tracked in the same pass: ~free vs a recall
          all[(size_t)ai * L + j] =
              B.lpmf[ai] + B.emission(seq, L, blw, blc, j, D, &pos) + pre;
          allpos[(size_t)ai * L + j] = pos;
        }
      }
      for (int j = 0; j < L; ++j) {
        double best = kImpossible;
        int64_t best_D = -10000;
        int best_ai = -1;
        for (int ai = 0; ai < B.nD; ++ai) {
          double v = all[(size_t)ai * L + j];
          if (B.blen + B.art[ai] < 0) continue;
          if (v > best) { best = v; best_D = B.art[ai]; best_ai = ai; }
        }
        bas[j] = best_D;
        if (best_D == -10000 || best_D == 0) {
          bap[j] = -1;
        } else {
          bap[j] = allpos[(size_t)best_ai * L + j];
        }
        // exact logsumexp over the artifact axis
        double m = best, s = 0.0;
        for (int ai = 0; ai < B.nD; ++ai) {
          if (B.blen + B.art[ai] < 0) continue;
          s += std::exp(all[(size_t)ai * L + j] - m);
        }
        M[j] = m + std::log(s);
        I[j] = kImpossible;
        Dl[j] = kImpossible;
      }
      continue;
    }
    const double* Mp = match + (size_t)(r - 1) * L;
    const double* Dp = delete_m + (size_t)(r - 1) * L;
    uint8_t ch = row_char[r];
    if (kind == 2) {
      // row just after a stutter block: must be entered via match
      M[0] = (seq[0] == ch ? blc[0] : blw[0]);
      for (int j = 1; j < L; ++j)
        M[j] = (seq[j] == ch ? blc[j] : blw[j]) + Mp[j - 1];
      for (int j = 0; j < L; ++j) { I[j] = kImpossible; Dl[j] = kImpossible; }
      continue;
    }
    // regular flank row (kind == 1)
    int h = row_homop[r];
    double am = m2m[h], aio = m2i[h], ad = m2d[h];
    double prevI = 0.0;
    for (int j = 0; j < L; ++j) {
      Dl[j] = std::max(Mp[j] + d2m, Dp[j] + d2d);
      double A = (j == 0) ? 0.0 : Mp[j - 1] + i2m;
      double Iv = blc[j] + ((j == 0) ? A : std::max(A, prevI + i2i));
      I[j] = Iv;
      double T = (j == 0) ? 0.0
                          : std::max(prevI + aio,
                                     std::max(Mp[j - 1] + am, Dp[j - 1] + ad));
      M[j] = (seq[j] == ch ? blc[j] : blw[j]) + T;
      prevI = Iv;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Adapter-trim index search (semantics of hipstr_tpu/pipeline/adapter_trimmer,
// reference: src/adapter_trimmer.cpp — <=1 mismatch, overlap >= min_overlap,
// mismatch only allowed when 1/overlap < max_err).

static inline int mm_le1(const char* a, const char* b, int n) {
  int mm = 0;
  for (int i = 0; i < n; ++i)
    if (a[i] != b[i] && ++mm > 1) return 2;
  return mm;
}

extern "C" int32_t adapter_trim_3p(const char* bases, int32_t read_len,
                                   const char* adapters, const int32_t* offs,
                                   const int32_t* alens, int32_t n_adapters,
                                   int32_t min_overlap, double max_err) {
  int trim_index = read_len;
  for (int a = 0; a < n_adapters; ++a) {
    const char* ad = adapters + offs[a];
    int alen = alens[a];
    for (int index = 0; index <= read_len - min_overlap; ++index) {
      int max_match = std::min(alen, read_len - index);
      int mm = mm_le1(bases + index, ad, max_match);
      if (mm == 0 || (mm == 1 && 1.0 / max_match < max_err)) {
        if (index < trim_index) trim_index = index;
        break;
      }
    }
  }
  return trim_index;
}

extern "C" int32_t adapter_trim_5p(const char* bases, int32_t read_len,
                                   const char* adapters, const int32_t* offs,
                                   const int32_t* alens, int32_t n_adapters,
                                   int32_t min_overlap, double max_err) {
  int trim_index = -1;
  for (int a = 0; a < n_adapters; ++a) {
    const char* ad = adapters + offs[a];
    int alen = alens[a];
    for (int index = read_len - 1; index >= min_overlap - 1; --index) {
      int max_match = std::min(alen, index + 1);
      int mm = mm_le1(bases + index - max_match + 1,
                      ad + alen - max_match, max_match);
      if (mm == 0 || (mm == 1 && 1.0 / max_match < max_err)) {
        if (index > trim_index) trim_index = index;
        break;
      }
    }
  }
  return trim_index;
}

// ---------------------------------------------------------------------------
// End-match window scans for HasLargestEndMatches (reference:
// src/alignment_filters.cpp via src/zalgorithm.cpp).  out must hold
// hi - lo + 1 entries.

extern "C" void prefix_match_counts(const char* s1, int32_t n1,
                                    const char* s2, int32_t n2,
                                    int32_t lo, int32_t hi, int32_t* out) {
  for (int i = lo; i <= hi; ++i) {
    int a = 0;
    while (a < n1 && i + a < n2 && s1[a] == s2[i + a]) a++;
    out[i - lo] = a;
  }
}

extern "C" void suffix_match_counts(const char* s1, int32_t n1,
                                    const char* s2, int32_t n2,
                                    int32_t lo, int32_t hi, int32_t* out) {
  for (int i = lo; i <= hi; ++i) {
    int a = 0;
    while (a < n1 && i - a >= 0 && s1[n1 - 1 - a] == s2[i - a]) a++;
    out[i - lo] = a;
  }
}

// ---------------------------------------------------------------------------
// Viterbi-style traceback walk over one segment's DP matrices (semantics of
// hipstr_tpu/align/retrace.py `retrace`, itself the parity port of reference
// src/SeqAlignment/HapAligner.cpp:363-571).  Emits the alignment op string
// plus ordered flank fragments / stutter data / SNP + indel events; the
// Python wrapper applies orientation fix-ups and fills AlignmentTrace.

extern "C" int32_t hmm_retrace_walk(
    const uint8_t* seq, int32_t seg_len, const double* blc,
    int32_t n_blocks, const uint8_t* bseq_pool, const int32_t* blk_off,
    const int32_t* blk_len, const uint8_t* blk_is_stutter,
    const int32_t* blk_src_start, const int32_t* homop_pool,
    const int32_t* homop_off, int32_t reversed_flag,
    int32_t block_index, int32_t base_index, int32_t row, int32_t col,
    const double* M, const double* I, const double* D, int32_t Lcols,
    const int64_t* bas, const int64_t* bap,
    const double* m2m, const double* m2i, const double* m2d,
    double i2i, double i2m, double d2d, double d2m,
    double min_snp_lpc, double tol,
    uint8_t* aln_out, int32_t* aln_len,
    int32_t* frag_block, int32_t* frag_end, int32_t* n_frags,
    uint8_t* frag_pool,
    int32_t* str_block, int32_t* str_size, int32_t* str_end, int32_t* n_str,
    uint8_t* str_pool,
    int32_t* snp_pos, uint8_t* snp_base, int32_t* n_snps,
    int64_t* indel_pos, int64_t* indel_size, int32_t* n_indels,
    int32_t* flank_ins, int32_t* flank_del) {
  const int MATCH_T = 0, DEL_T = 1, INS_T = 2, NONE_T = -1;
  int seq_index = seg_len - 1;
  int matrix_type = MATCH_T;
  int na = 0, nf = 0, ns = 0, nq = 0, ni = 0, fpool = 0, spool = 0;
  *flank_ins = 0;
  *flank_del = 0;
  const bool rev = reversed_flag != 0;

  int n_rows_guess = 0;
  for (int b = 0; b < n_blocks; ++b) n_rows_guess += blk_len[b];
  auto Mat = [&](const double* X, int r, int c) -> double {
    // numpy-style negative-index wrap, for exact parity with the Python walk
    if (c < 0) c += Lcols;
    if (r < 0) r += n_rows_guess;
    return X[(size_t)r * Lcols + c];
  };
  // tie-break selectors (fw prefers the LAST of tied options, rev the FIRST;
  // reference triple_min_index / matching Python fns with TRACE_LL_TOL)
  auto triple = [&](double v1, double v2, double v3) -> int {
    if (!rev) {
      if (v1 > v2 + tol) return (v1 > v3 + tol) ? 0 : 2;
      return (v2 > v3 + tol) ? 1 : 2;
    }
    if (v3 > v2 + tol) return (v3 > v1 + tol) ? 2 : 0;
    return (v2 > v1 + tol) ? 1 : 0;
  };
  auto pair_sel = [&](double v1, double v2) -> int {
    if (!rev) return (v1 > v2 + tol) ? 0 : 1;
    return (v2 > v1 + tol) ? 1 : 0;
  };

  while (block_index >= 0) {
    const uint8_t* bseq = bseq_pool + blk_off[block_index];
    int blen = blk_len[block_index];
    if (blk_is_stutter[block_index]) {
      long stutter_size = bas[(size_t)block_index * Lcols + seq_index];
      long art_pos = bap[(size_t)block_index * Lcols + seq_index];
      // str sequence collected back-to-front
      int sp_start = spool;
      int i = 0;
      long lim1 = std::min((long)seq_index + 1, art_pos);
      while (i < lim1) {
        aln_out[na++] = 'M';
        str_pool[spool++] = seq[seq_index - i];
        i++;
      }
      if (stutter_size < 0) {
        for (long k = 0; k < -stutter_size; ++k) aln_out[na++] = 'D';
      } else {
        long lim2 = std::min((long)seq_index + 1, art_pos + stutter_size);
        while (i < lim2) {
          aln_out[na++] = 'I';
          str_pool[spool++] = seq[seq_index - i];
          i++;
        }
      }
      long lim3 = std::min((long)blen + stutter_size, (long)seq_index + 1);
      while (i < lim3) {
        aln_out[na++] = 'M';
        str_pool[spool++] = seq[seq_index - i];
        i++;
      }
      str_block[ns] = block_index;
      str_size[ns] = (int32_t)stutter_size;
      str_end[ns] = spool;
      ns++;
      (void)sp_start;
      if (blen + stutter_size >= seq_index + 1) {
        goto done;  // read doesn't span the stutter block
      }
      int consumed = blen + (int)stutter_size;
      seq_index -= consumed;
      col -= consumed;
      row -= blen;
      matrix_type = MATCH_T;
    } else {
      int prev_matrix_type = NONE_T;
      long pos = blk_src_start[block_index]
               + (rev ? -base_index : base_index);
      int increment = rev ? 1 : -1;
      int indel_seq_index = -1;
      long indel_position = -1;
      const int32_t* homop_tbl = homop_pool + homop_off[block_index];
      int frag_start = fpool;

      while (base_index >= 0 && seq_index >= 0) {
        int homop = homop_tbl[base_index];

        if (matrix_type != prev_matrix_type) {
          if (prev_matrix_type == DEL_T) {
            if (rev) {
              indel_pos[ni] = indel_position;
              indel_size[ni] = indel_position - pos;
            } else {
              indel_pos[ni] = pos + 1;
              indel_size[ni] = pos - indel_position;
            }
            ni++;
          } else if (prev_matrix_type == INS_T) {
            indel_pos[ni] = indel_position + (rev ? 0 : 1);
            indel_size[ni] = indel_seq_index - seq_index;
            ni++;
          }
          if (matrix_type == DEL_T || matrix_type == INS_T) {
            indel_seq_index = seq_index;
            indel_position = pos;
          }
          prev_matrix_type = matrix_type;
        }

        if (matrix_type == MATCH_T) {
          if (bseq[base_index] != seq[seq_index]
              && blc[seq_index] > min_snp_lpc) {
            snp_pos[nq] = (int32_t)pos;
            snp_base[nq] = seq[seq_index];
            nq++;
          }
          frag_pool[fpool++] = seq[seq_index];
          aln_out[na++] = 'M';
          seq_index--;
          base_index--;
          pos += increment;
        } else if (matrix_type == DEL_T) {
          (*flank_del)++;
          aln_out[na++] = 'D';
          base_index--;
          pos += increment;
        } else {
          (*flank_ins)++;
          frag_pool[fpool++] = seq[seq_index];
          aln_out[na++] = 'I';
          seq_index--;
        }

        if (seq_index == -1 || (base_index == -1 && block_index == 0)) {
          while (seq_index != -1) {
            aln_out[na++] = 'S';
            seq_index--;
          }
          frag_block[nf] = block_index;
          frag_end[nf] = fpool;
          nf++;
          (void)frag_start;
          goto done;
        }

        if (matrix_type == MATCH_T) {
          int best = triple(Mat(I, row, col - 1) + m2i[homop],
                            Mat(D, row - 1, col - 1) + m2d[homop],
                            Mat(M, row - 1, col - 1) + m2m[homop]);
          if (best == 0) {
            matrix_type = INS_T;
            col--;
          } else if (best == 1) {
            matrix_type = DEL_T;
            row--;
            col--;
          } else {
            matrix_type = MATCH_T;
            row--;
            col--;
          }
        } else if (matrix_type == DEL_T) {
          int best = pair_sel(Mat(D, row - 1, col) + d2d,
                              Mat(M, row - 1, col) + d2m);
          matrix_type = (best == 0) ? DEL_T : MATCH_T;
          row--;
        } else {
          int best = pair_sel(Mat(I, row, col - 1) + i2i,
                              Mat(M, row - 1, col - 1) + i2m);
          if (best == 0) {
            matrix_type = INS_T;
            col--;
          } else {
            matrix_type = MATCH_T;
            row--;
            col--;
          }
        }
      }

      frag_block[nf] = block_index;
      frag_end[nf] = fpool;
      nf++;
    }
    block_index--;
    if (block_index >= 0) base_index = blk_len[block_index] - 1;
  }

done:
  *aln_len = na;
  *n_frags = nf;
  *n_str = ns;
  *n_snps = nq;
  *n_indels = ni;
  (void)spool;
  return 0;
}

// ---------------------------------------------------------------------------
// Merge a read->haplotype op string with a haplotype->reference op string
// walking in one direction (semantics of align/traceback.py _stitch,
// reference src/SeqAlignment/AlignmentTraceback.cpp:7-53).  Returns the
// output length, or -1 on an invalid op pairing.

extern "C" int32_t stitch_ops(const char* hap_aln, int32_t hap_len,
                              const char* read_aln, int32_t read_len,
                              int32_t h_index, int32_t r_index,
                              int32_t increment, char* out) {
  int n = 0;
  while (r_index >= 0 && r_index < read_len) {
    char rc = read_aln[r_index];
    if (rc == 'S') {
      out[n++] = 'S';
      r_index += increment;
      continue;
    }
    if (h_index < 0 || h_index >= hap_len) return -1;
    char hc = hap_aln[h_index];
    if (hc == 'D') {
      if (rc == 'I') {
        out[n++] = 'M';
        r_index += increment;
        h_index += increment;
      } else {
        out[n++] = 'D';
        h_index += increment;
      }
    } else if (rc == 'I') {
      out[n++] = 'I';
      r_index += increment;
    } else if (rc == 'D') {
      if (hc == 'M') out[n++] = 'D';
      else if (hc != 'I') return -1;
      r_index += increment;
      h_index += increment;
    } else if (rc == 'M') {
      if (hc != 'M' && hc != 'I') return -1;
      out[n++] = hc;
      r_index += increment;
      h_index += increment;
    } else {
      return -1;
    }
  }
  return n;
}

// ---------------------------------------------------------------------------
// Consolidated per-trace orchestration: both flank DP fills, the seed-anchor
// combination, and both traceback walks in ONE call (python previously made
// five ctypes calls plus numpy glue per trace; reference flow:
// HapAligner::process_read retrace branch, HapAligner.cpp:614-691, and
// compute_aln_logprob, HapAligner.cpp:163-231).  Event-array outputs have
// the same layout as hmm_retrace_walk; the caller assembles the
// AlignmentTrace exactly as before.

struct TraceFillArgs {
  int32_t H, n_blocks;
  const uint8_t *row_kind, *row_char;
  const int32_t* row_homop;
  int32_t n_st;
  const int32_t *st_row, *st_block;
  const uint8_t* st_seq_pool;
  const int32_t *st_off, *st_len, *st_period, *st_max_ins, *st_max_del,
      *st_left_align, *st_nD, *st_art_off, *art_sizes;
  const double* art_lpmf;
  const double *m2m, *m2i, *m2d;
  double i2i, i2m, d2d, d2m;
};

struct TraceWalkArgs {
  int32_t n_blocks;
  const uint8_t* bseq_pool;
  const int32_t *blk_off, *blk_len;
  const uint8_t* blk_is_stutter;
  const int32_t *blk_src_start, *homop_pool, *homop_off;
};

struct TraceWalkOut {
  uint8_t* aln_out; int32_t* aln_len;
  int32_t *frag_block, *frag_end, *n_frags; uint8_t* frag_pool;
  int32_t *str_block, *str_size, *str_end, *n_str; uint8_t* str_pool;
  int32_t* snp_pos; uint8_t* snp_base; int32_t* n_snps;
  int64_t *indel_pos, *indel_size; int32_t* n_indels;
  int32_t *flank_ins, *flank_del;
};

static int fill_segment(const TraceFillArgs* fa, const uint8_t* seq,
                        int32_t L, const double* blw, const double* blc,
                        std::vector<double>& M, std::vector<double>& I,
                        std::vector<double>& D, std::vector<int64_t>& bas,
                        std::vector<int64_t>& bap, double* out_lp) {
  M.resize((size_t)fa->H * L);
  I.resize((size_t)fa->H * L);
  D.resize((size_t)fa->H * L);
  bas.assign((size_t)fa->n_blocks * L, -10000);
  bap.assign((size_t)fa->n_blocks * L, -1);
  return hmm_fill_dp(seq, L, blw, blc, fa->H, fa->n_blocks, fa->row_kind,
                     fa->row_char, fa->row_homop, fa->n_st, fa->st_row,
                     fa->st_block, fa->st_seq_pool, fa->st_off, fa->st_len,
                     fa->st_period, fa->st_max_ins, fa->st_max_del,
                     fa->st_left_align, fa->st_nD, fa->st_art_off,
                     fa->art_sizes, fa->art_lpmf, fa->m2m, fa->m2i, fa->m2d,
                     fa->i2i, fa->i2m, fa->d2d, fa->d2m, M.data(), I.data(),
                     D.data(), bas.data(), bap.data(), out_lp);
}

static void hap_coords(const TraceWalkArgs* wa, int32_t hap_pos,
                       int32_t* block, int32_t* coord) {
  for (int b = 0; b < wa->n_blocks; ++b) {
    if (hap_pos < wa->blk_len[b]) { *block = b; *coord = hap_pos; return; }
    hap_pos -= wa->blk_len[b];
  }
  *block = -1;  // out of range: caller treats as error
  *coord = -1;
}

static int32_t run_walk(const TraceFillArgs* fa, const TraceWalkArgs* wa,
                        int reversed_flag, int32_t start_index,
                        const uint8_t* seq, int32_t seg_len,
                        const double* blc, const std::vector<double>& M,
                        const std::vector<double>& I,
                        const std::vector<double>& D,
                        const std::vector<int64_t>& bas,
                        const std::vector<int64_t>& bap, double min_snp_lpc,
                        double tol, const TraceWalkOut* out) {
  int32_t block, coord;
  hap_coords(wa, start_index, &block, &coord);
  if (block < 0) return -10;
  int32_t base_index;
  if (coord == 0) {
    block -= 1;
    if (block < 0) return -11;
    base_index = wa->blk_len[block] - 1;
  } else {
    base_index = coord - 1;
  }
  return hmm_retrace_walk(
      seq, seg_len, blc, wa->n_blocks, wa->bseq_pool, wa->blk_off,
      wa->blk_len, wa->blk_is_stutter, wa->blk_src_start, wa->homop_pool,
      wa->homop_off, reversed_flag, block, base_index, start_index - 1,
      seg_len - 1, M.data(), I.data(), D.data(), seg_len, bas.data(),
      bap.data(), fa->m2m, fa->m2i, fa->m2d, fa->i2i, fa->i2m, fa->d2d,
      fa->d2m, min_snp_lpc, tol, out->aln_out, out->aln_len,
      out->frag_block, out->frag_end, out->n_frags, out->frag_pool,
      out->str_block, out->str_size, out->str_end, out->n_str,
      out->str_pool, out->snp_pos, out->snp_base, out->n_snps,
      out->indel_pos, out->indel_size, out->n_indels, out->flank_ins,
      out->flank_del);
}

extern "C" int32_t hmm_trace_full(
    const uint8_t* seq, int32_t L, const double* blw, const double* blc,
    int32_t seed_base,
    const TraceFillArgs* fw_fill, const TraceWalkArgs* fw_walk,
    const TraceFillArgs* rev_fill, const TraceWalkArgs* rev_walk,
    const int64_t* mid_rows, const int64_t* mid_chars, int32_t n_mid,
    double seed_log_prior, int32_t first_code, int32_t last_code,
    double min_snp_lpc, double tol,
    int32_t* out_max_index, double* out_LL,
    int32_t* left_valid, const TraceWalkOut* left_out,
    int32_t* right_valid, const TraceWalkOut* right_out) {
  if (seed_base <= 0 || seed_base >= L - 1) return -1;
  const int32_t llen = seed_base;
  const int32_t rlen = L - 1 - seed_base;
  const int32_t hapsize = fw_fill->H;

  // right segment: read suffix reversed, with its blw/blc
  thread_local std::vector<uint8_t> r_seq;
  thread_local std::vector<double> r_blw, r_blc;
  r_seq.resize(rlen);
  r_blw.resize(rlen);
  r_blc.resize(rlen);
  for (int j = 0; j < rlen; ++j) {
    r_seq[j] = seq[L - 1 - j];
    r_blw[j] = blw[L - 1 - j];
    r_blc[j] = blc[L - 1 - j];
  }

  thread_local std::vector<double> lM, lI, lD, rM, rI, rD;
  thread_local std::vector<int64_t> l_bas, l_bap, r_bas, r_bap;
  double l_prob = 0.0, r_prob = 0.0;
  int rc = fill_segment(fw_fill, seq, llen, blw, blc, lM, lI, lD, l_bas,
                        l_bap, &l_prob);
  if (rc != 0) return rc;
  rc = fill_segment(rev_fill, r_seq.data(), rlen, r_blw.data(), r_blc.data(),
                    rM, rI, rD, r_bas, r_bap, &r_prob);
  if (rc != 0) return rc;

  // seed-anchored combination (python compute_aln_logprob: identical
  // per-element add order; first-max tie-breaking like np.argmax)
  const double blc_s = blc[seed_base], blw_s = blw[seed_base];
  const uint8_t sc = seq[seed_base];
  const double lp0 = seed_log_prior + (sc == (uint8_t)first_code ? blc_s
                                                                 : blw_s) +
                     l_prob + rM[(size_t)(hapsize - 2) * rlen + (rlen - 1)];
  const double lp1 = seed_log_prior + (sc == (uint8_t)last_code ? blc_s
                                                                : blw_s) +
                     r_prob + lM[(size_t)(hapsize - 2) * llen + (llen - 1)];
  double best = lp0;
  int best_i = 0;
  if (lp1 > best) { best = lp1; best_i = 1; }
  double lse_m = std::max(lp0, lp1), lse_s = 0.0;
  thread_local std::vector<double> mids;
  mids.resize(n_mid);
  for (int k = 0; k < n_mid; ++k) {
    const int64_t row = mid_rows[k];
    double v = seed_log_prior +
               ((uint8_t)mid_chars[k] == sc ? blc_s : blw_s) +
               lM[(size_t)(row - 1) * llen + (llen - 1)] +
               rM[(size_t)(hapsize - row - 2) * rlen + (rlen - 1)];
    mids[k] = v;
    if (v > best) { best = v; best_i = k + 2; }
    if (v > lse_m) lse_m = v;
  }
  lse_s = std::exp(lp0 - lse_m) + std::exp(lp1 - lse_m);
  for (int k = 0; k < n_mid; ++k) lse_s += std::exp(mids[k] - lse_m);
  *out_LL = lse_m + std::log(lse_s);

  int32_t max_index;
  if (best_i == 0) max_index = 0;
  else if (best_i == 1) max_index = hapsize - 1;
  else max_index = (int32_t)mid_rows[best_i - 2];
  *out_max_index = max_index;

  *left_valid = 0;
  *right_valid = 0;
  if (max_index != 0) {
    rc = run_walk(fw_fill, fw_walk, 0, max_index, seq, llen, blc, lM, lI,
                  lD, l_bas, l_bap, min_snp_lpc, tol, left_out);
    if (rc != 0) return rc;
    *left_valid = 1;
  }
  const int32_t rev_max_index = hapsize - 1 - max_index;
  if (rev_max_index != 0) {
    rc = run_walk(rev_fill, rev_walk, 1, rev_max_index, r_seq.data(), rlen,
                  r_blc.data(), rM, rI, rD, r_bas, r_bap, min_snp_lpc, tol,
                  right_out);
    if (rc != 0) return rc;
    *right_valid = 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Full trace stitch: read->haplotype + haplotype->reference => read->reference
// in ONE call (semantics of align/traceback.py stitch_alignment_trace,
// reference src/SeqAlignment/AlignmentTraceback.cpp:55-144).  Emits the
// run-length-encoded CIGAR, the reference start/stop, and the aligned string
// (read bases with '-' for deletions) so python only wraps the results.
// Returns 0 on success, -1 on an invalid op pairing or assertion failure
// (caller falls back to the python path, which raises).

static int stitch_dir(const char* hap_aln, int32_t hap_len,
                      const char* read_aln, int32_t read_len,
                      int32_t h_index, int32_t r_index, int32_t increment,
                      char* out, int32_t* out_n) {
  int n = 0;
  while (r_index >= 0 && r_index < read_len) {
    char rc = read_aln[r_index];
    if (rc == 'S') {
      out[n++] = 'S';
      r_index += increment;
      continue;
    }
    if (h_index < 0 || h_index >= hap_len) return -1;
    char hc = hap_aln[h_index];
    if (hc == 'D') {
      if (rc == 'I') {
        out[n++] = 'M';
        r_index += increment;
        h_index += increment;
      } else {
        out[n++] = 'D';
        h_index += increment;
      }
    } else if (rc == 'I') {
      out[n++] = 'I';
      r_index += increment;
    } else if (rc == 'D') {
      if (hc == 'M') out[n++] = 'D';
      else if (hc != 'I') return -1;
      r_index += increment;
      h_index += increment;
    } else if (rc == 'M') {
      if (hc != 'M' && hc != 'I') return -1;
      out[n++] = hc;
      r_index += increment;
      h_index += increment;
    } else {
      return -1;
    }
  }
  *out_n = n;
  return 0;
}

extern "C" int32_t stitch_trace(
    const char* hap_aln, int32_t hap_len,    // haplotype->reference ops
    const char* read_aln, int32_t read_len,  // read->haplotype ops
    int64_t hap_start, int32_t hap_index, int32_t seed_base,
    const char* bases, int32_t bases_len,
    int64_t* out_start, int64_t* out_stop,
    char* cigar_ops, int32_t* cigar_num, int32_t* n_cigar,  // cap: full len
    char* aln_out, int32_t* aln_len) {                      // cap: full len
  // advance to the seed's position in the hap->ref alignment
  int32_t hap_aln_index = 0;
  int64_t seed_pos = hap_start;
  int32_t hi = hap_index;
  while (hi > 0 && hap_aln_index < hap_len) {
    char c = hap_aln[hap_aln_index];
    if (c == 'M' || c == 'I') --hi;
    if (c == 'M' || c == 'D') ++seed_pos;
    ++hap_aln_index;
  }
  while (hap_aln_index < hap_len && hap_aln[hap_aln_index] == 'D')
    ++hap_aln_index;
  if (hap_aln_index == hap_len) return -1;

  // advance to the seed's position in the read->hap alignment
  int32_t read_aln_index = 0;
  int32_t sb = seed_base;
  while (sb > 0 && read_aln_index < read_len) {
    char c = read_aln[read_aln_index];
    if (c == 'M' || c == 'I' || c == 'S') --sb;
    ++read_aln_index;
  }
  while (read_aln_index < read_len && read_aln[read_aln_index] == 'D')
    ++read_aln_index;
  if (read_aln_index == read_len) return -1;

  // full = reverse(stitch left) + 'M' + stitch right
  std::vector<char> full(hap_len + read_len + 2);
  int32_t n_left = 0;
  if (stitch_dir(hap_aln, hap_len, read_aln, read_len, hap_aln_index - 1,
                 read_aln_index - 1, -1, full.data(), &n_left) != 0)
    return -1;
  std::reverse(full.data(), full.data() + n_left);
  int64_t left_dm = 0;
  for (int i = 0; i < n_left; ++i)
    if (full[i] == 'D' || full[i] == 'M') ++left_dm;
  full[n_left] = 'M';
  int32_t n_right = 0;
  if (stitch_dir(hap_aln, hap_len, read_aln, read_len, hap_aln_index + 1,
                 read_aln_index + 1, 1, full.data() + n_left + 1,
                 &n_right) != 0)
    return -1;
  int64_t right_dm = 0;
  for (int i = n_left + 1; i < n_left + 1 + n_right; ++i)
    if (full[i] == 'D' || full[i] == 'M') ++right_dm;
  const int32_t n_full = n_left + 1 + n_right;

  // leading insertions become soft clips
  for (int i = 0; i < n_full && full[i] == 'I'; ++i) full[i] = 'S';

  *out_start = seed_pos - left_dm;
  *out_stop = seed_pos + right_dm;

  // run-length encode + build the aligned string
  int nc = 0, na = 0, read_index = 0;
  for (int i = 0; i < n_full; ++i) {
    char c = full[i];
    if (nc > 0 && cigar_ops[nc - 1] == c) {
      ++cigar_num[nc - 1];
    } else {
      cigar_ops[nc] = c;
      cigar_num[nc] = 1;
      ++nc;
    }
    if (c == 'S') {
      ++read_index;
    } else if (c == 'M' || c == 'I') {
      if (read_index >= bases_len) return -1;
      aln_out[na++] = bases[read_index++];
    } else if (c == 'D') {
      aln_out[na++] = '-';
    } else {
      return -1;
    }
  }
  *n_cigar = nc;
  *aln_len = na;
  return 0;
}

// ---------------------------------------------------------------------------
// Batched traces: N independent (read pool, haplotype) traces in ONE call.
// Inputs arrive as parallel pointer arrays (one element per job); event
// outputs land in caller-allocated pooled buffers with fixed per-slot
// strides, slot s = 2*job + direction (0 = left/fw, 1 = right/rev).  Each
// job is exactly hmm_trace_full; out_rc[i] != 0 marks a failed job the
// caller re-runs through its python fallback.  With n_threads > 1 the jobs
// are chunked across std::thread workers — slots are disjoint, so the
// output is bit-identical to the sequential order.

extern "C" int32_t hmm_trace_batch(
    int32_t n,
    const void* const* seq_ptrs, const int32_t* Ls,
    const void* const* blw_ptrs, const void* const* blc_ptrs,
    const int32_t* seed_bases,
    const void* const* fw_fill_ptrs, const void* const* fw_walk_ptrs,
    const void* const* rev_fill_ptrs, const void* const* rev_walk_ptrs,
    const void* const* mid_rows_ptrs, const void* const* mid_chars_ptrs,
    const int32_t* n_mids, const double* seed_log_priors,
    const int32_t* first_codes, const int32_t* last_codes,
    double min_snp_lpc, double tol, int32_t n_threads,
    double* out_LL, int32_t* out_max_index, int32_t* out_rc,
    uint8_t* out_valid,                                    // [2n]
    uint8_t* aln_pool, int32_t aln_stride, int32_t* aln_len,
    int32_t* frag_block, int32_t* frag_end, int32_t frag_stride,
    int32_t* n_frags, uint8_t* fragp_pool, int32_t fragp_stride,
    int32_t* str_block, int32_t* str_size, int32_t* str_end,
    int32_t str_stride, int32_t* n_str, uint8_t* strp_pool,
    int32_t strp_stride,
    int32_t* snp_pos, uint8_t* snp_base, int32_t snp_stride, int32_t* n_snps,
    int64_t* indel_pos, int64_t* indel_size, int32_t indel_stride,
    int32_t* n_indels, int32_t* flank_ins, int32_t* flank_del) {
  auto run_range = [&](int32_t lo, int32_t hi) {
    for (int32_t i = lo; i < hi; ++i) {
      TraceWalkOut outs[2];
      for (int d = 0; d < 2; ++d) {
        const int64_t s = 2 * (int64_t)i + d;
        outs[d].aln_out = aln_pool + s * aln_stride;
        outs[d].aln_len = aln_len + s;
        outs[d].frag_block = frag_block + s * frag_stride;
        outs[d].frag_end = frag_end + s * frag_stride;
        outs[d].n_frags = n_frags + s;
        outs[d].frag_pool = fragp_pool + s * fragp_stride;
        outs[d].str_block = str_block + s * str_stride;
        outs[d].str_size = str_size + s * str_stride;
        outs[d].str_end = str_end + s * str_stride;
        outs[d].n_str = n_str + s;
        outs[d].str_pool = strp_pool + s * strp_stride;
        outs[d].snp_pos = snp_pos + s * snp_stride;
        outs[d].snp_base = snp_base + s * snp_stride;
        outs[d].n_snps = n_snps + s;
        outs[d].indel_pos = indel_pos + s * indel_stride;
        outs[d].indel_size = indel_size + s * indel_stride;
        outs[d].n_indels = n_indels + s;
        outs[d].flank_ins = flank_ins + s;
        outs[d].flank_del = flank_del + s;
      }
      int32_t lv = 0, rv = 0;
      out_rc[i] = hmm_trace_full(
          (const uint8_t*)seq_ptrs[i], Ls[i], (const double*)blw_ptrs[i],
          (const double*)blc_ptrs[i], seed_bases[i],
          (const TraceFillArgs*)fw_fill_ptrs[i],
          (const TraceWalkArgs*)fw_walk_ptrs[i],
          (const TraceFillArgs*)rev_fill_ptrs[i],
          (const TraceWalkArgs*)rev_walk_ptrs[i],
          (const int64_t*)mid_rows_ptrs[i], (const int64_t*)mid_chars_ptrs[i],
          n_mids[i], seed_log_priors[i], first_codes[i], last_codes[i],
          min_snp_lpc, tol, out_max_index + i, out_LL + i, &lv, &outs[0],
          &rv, &outs[1]);
      out_valid[2 * i] = (uint8_t)lv;
      out_valid[2 * i + 1] = (uint8_t)rv;
    }
  };
  if (n_threads <= 1 || n < 2 * n_threads) {
    run_range(0, n);
  } else {
    std::vector<std::thread> threads;
    const int32_t chunk = (n + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int32_t lo = t * chunk, hi = std::min(n, lo + chunk);
      if (lo >= hi) break;
      threads.emplace_back(run_range, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Batched trace stitching: N independent read->reference merges in ONE call
// (same per-job semantics as stitch_trace; reference
// AlignmentTraceback.cpp:55-144).  Outputs land in caller-allocated pools
// with a shared per-job stride >= hap_len[i] + read_len[i] + 2; out_rc[i]
// != 0 marks a job the caller must re-run through its fallback.

extern "C" int32_t stitch_trace_batch(
    int32_t n,
    const void* const* hap_alns, const int32_t* hap_lens,
    const void* const* read_alns, const int32_t* read_lens,
    const int64_t* hap_starts, const int32_t* hap_indices,
    const int32_t* seed_bases,
    const void* const* bases_ptrs, const int32_t* bases_lens,
    int32_t stride,
    int64_t* out_start, int64_t* out_stop,
    char* cigar_ops_pool, int32_t* cigar_num_pool, int32_t* n_cigar,
    char* aln_pool, int32_t* aln_len, int32_t* out_rc) {
  for (int32_t i = 0; i < n; ++i) {
    const int64_t off = (int64_t)i * stride;
    out_rc[i] = stitch_trace(
        (const char*)hap_alns[i], hap_lens[i],
        (const char*)read_alns[i], read_lens[i],
        hap_starts[i], hap_indices[i], seed_bases[i],
        (const char*)bases_ptrs[i], bases_lens[i],
        out_start + i, out_stop + i,
        cigar_ops_pool + off, cigar_num_pool + off, n_cigar + i,
        aln_pool + off, aln_len + i);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Columnar trace summaries: for N (read pool, haplotype) jobs, run the full
// trace (fill + seed combine + walks), assemble the read->haplotype op
// string, stitch it through the haplotype->reference alignment, and emit
// ONLY flat arrays -- no per-job object assembly on the caller's side.
// Semantics: align/retrace.py _assemble_native + _apply_walk_events +
// align/traceback.py stitch_alignment_trace (reference:
// src/SeqAlignment/HapAligner.cpp:573-709 retrace branch and
// src/SeqAlignment/AlignmentTraceback.cpp:55-144), reduced to the fields the
// genotyping pipeline consumes: LL, traced start/stop, per-block stutter
// size + STR sequence, per-block flank sequence, flank ins/del totals, and
// (for visualization) the stitched CIGAR + aligned string.
//
// Outputs land in caller-allocated pools with fixed strides:
//   per-block arrays use stride nb_stride (>= max n_blocks),
//   str/flank byte pools use str_stride/flank_stride (>= max L + 2),
//   cigar/aligned pools use cig_stride (>= max hap_len + L + 4).
// out_rc[i] != 0 marks a failed job the caller re-runs via its fallback.

extern "C" int32_t hmm_trace_summary_batch(
    int32_t n,
    const void* const* seq_ptrs, const int32_t* Ls,
    const void* const* blw_ptrs, const void* const* blc_ptrs,
    const int32_t* seed_bases,
    const void* const* fw_fill_ptrs, const void* const* fw_walk_ptrs,
    const void* const* rev_fill_ptrs, const void* const* rev_walk_ptrs,
    const void* const* mid_rows_ptrs, const void* const* mid_chars_ptrs,
    const int32_t* n_mids, const double* seed_log_priors,
    const int32_t* first_codes, const int32_t* last_codes,
    const void* const* hap_aln_ptrs, const int32_t* hap_lens,
    const int64_t* hap_starts,
    double min_snp_lpc, double tol, int32_t n_threads,
    // columnar outputs
    int32_t* out_rc, double* out_LL, int32_t* out_max_index,
    int64_t* out_start, int64_t* out_stop,
    int32_t* out_flank_ins, int32_t* out_flank_del,
    int32_t nb_stride, int32_t* stut_size, uint8_t* stut_valid,
    int32_t str_stride, uint8_t* str_pool, int32_t* str_off,
    int32_t* str_len,
    int32_t flank_stride, uint8_t* flank_pool, int32_t* flank_off,
    int32_t* flank_len,
    int32_t cig_stride, char* cigar_ops_pool, int32_t* cigar_num_pool,
    int32_t* n_cigar, char* aln_pool, int32_t* aln_len) {
  auto run_range = [&](int32_t lo, int32_t hi) {
    // per-thread scratch: walk outputs + assembly buffers, grow-only
    std::vector<uint8_t> w_aln[2], w_fragp[2], w_strp[2];
    std::vector<int32_t> w_fb[2], w_fe[2], w_sb[2], w_ss[2], w_se[2];
    std::vector<int32_t> w_snpp[2];
    std::vector<uint8_t> w_snpb[2];
    std::vector<int64_t> w_ip[2], w_is[2];
    int32_t w_aln_len[2], w_nf[2], w_ns[2], w_nq[2], w_ni[2];
    int32_t w_fi[2], w_fd[2];
    std::vector<uint8_t> read_aln;          // assembled read->hap ops
    std::vector<uint8_t> blk_flank, blk_str;  // per-block assembly
    for (int32_t i = lo; i < hi; ++i) {
      const TraceFillArgs* fw_fill = (const TraceFillArgs*)fw_fill_ptrs[i];
      const TraceWalkArgs* fw_walk = (const TraceWalkArgs*)fw_walk_ptrs[i];
      const TraceWalkArgs* rev_walk = (const TraceWalkArgs*)rev_walk_ptrs[i];
      const int32_t L = Ls[i];
      const int32_t nb = fw_walk->n_blocks;
      const int32_t H = fw_fill->H;
      const int32_t cap = H + L + 8;
      TraceWalkOut outs[2];
      for (int d = 0; d < 2; ++d) {
        w_aln[d].resize(cap);
        w_fragp[d].resize(L + 2);
        w_strp[d].resize(L + 2);
        w_fb[d].resize(nb + 2); w_fe[d].resize(nb + 2);
        w_sb[d].resize(nb + 1); w_ss[d].resize(nb + 1); w_se[d].resize(nb + 1);
        w_snpp[d].resize(L + 2); w_snpb[d].resize(L + 2);
        w_ip[d].resize(cap); w_is[d].resize(cap);
        w_aln_len[d] = w_nf[d] = w_ns[d] = w_nq[d] = w_ni[d] = 0;
        w_fi[d] = w_fd[d] = 0;
        outs[d].aln_out = w_aln[d].data(); outs[d].aln_len = &w_aln_len[d];
        outs[d].frag_block = w_fb[d].data(); outs[d].frag_end = w_fe[d].data();
        outs[d].n_frags = &w_nf[d]; outs[d].frag_pool = w_fragp[d].data();
        outs[d].str_block = w_sb[d].data(); outs[d].str_size = w_ss[d].data();
        outs[d].str_end = w_se[d].data(); outs[d].n_str = &w_ns[d];
        outs[d].str_pool = w_strp[d].data();
        outs[d].snp_pos = w_snpp[d].data(); outs[d].snp_base = w_snpb[d].data();
        outs[d].n_snps = &w_nq[d];
        outs[d].indel_pos = w_ip[d].data(); outs[d].indel_size = w_is[d].data();
        outs[d].n_indels = &w_ni[d];
        outs[d].flank_ins = &w_fi[d]; outs[d].flank_del = &w_fd[d];
      }
      int32_t lv = 0, rv = 0;
      int32_t rc = hmm_trace_full(
          (const uint8_t*)seq_ptrs[i], L, (const double*)blw_ptrs[i],
          (const double*)blc_ptrs[i], seed_bases[i],
          fw_fill, fw_walk, (const TraceFillArgs*)rev_fill_ptrs[i], rev_walk,
          (const int64_t*)mid_rows_ptrs[i], (const int64_t*)mid_chars_ptrs[i],
          n_mids[i], seed_log_priors[i], first_codes[i], last_codes[i],
          min_snp_lpc, tol, out_max_index + i, out_LL + i, &lv, &outs[0],
          &rv, &outs[1]);
      if (rc != 0) { out_rc[i] = rc; continue; }
      const uint8_t* seq = (const uint8_t*)seq_ptrs[i];
      const int32_t seed_base = seed_bases[i];
      const int32_t rlen = L - 1 - seed_base;
      const int32_t max_index = out_max_index[i];

      // seed's block in the forward haplotype
      int32_t seed_blk, seed_coord;
      hap_coords(fw_walk, max_index, &seed_blk, &seed_coord);
      if (seed_blk < 0) { out_rc[i] = -20; continue; }

      // ---- per-block stutter data ----------------------------------------
      int32_t* ss_out = stut_size + (size_t)i * nb_stride;
      uint8_t* sv_out = stut_valid + (size_t)i * nb_stride;
      int32_t* so_out = str_off + (size_t)i * nb_stride;
      int32_t* sl_out = str_len + (size_t)i * nb_stride;
      uint8_t* sp_out = str_pool + (size_t)i * str_stride;
      for (int b = 0; b < nb_stride; ++b) {
        ss_out[b] = 0; sv_out[b] = 0; so_out[b] = 0; sl_out[b] = 0;
      }
      int sp_used = 0;
      bool bad = false;
      for (int d = 0; d < 2 && !bad; ++d) {
        if ((d == 0 && !lv) || (d == 1 && !rv)) continue;
        int prev = 0;
        for (int k = 0; k < w_ns[d]; ++k) {
          int bi = w_sb[d][k];
          int fwd_bi = (d == 0) ? bi : (nb - 1 - bi);
          if (fwd_bi < 0 || fwd_bi >= nb || sv_out[fwd_bi]) { bad = true; break; }
          sv_out[fwd_bi] = 1;
          ss_out[fwd_bi] = w_ss[d][k];
          int len = w_se[d][k] - prev;
          so_out[fwd_bi] = sp_used;
          sl_out[fwd_bi] = len;
          if (d == 0) {       // left walk collects back-to-front: reverse
            for (int t = 0; t < len; ++t)
              sp_out[sp_used + t] = w_strp[d][prev + len - 1 - t];
          } else {
            for (int t = 0; t < len; ++t)
              sp_out[sp_used + t] = w_strp[d][prev + t];
          }
          sp_used += len;
          prev = w_se[d][k];
        }
      }
      if (bad) { out_rc[i] = -21; continue; }

      // ---- per-block flank sequences (left piece, seed char, right) ------
      uint8_t* fp_out = flank_pool + (size_t)i * flank_stride;
      int32_t* fo_out = flank_off + (size_t)i * nb_stride;
      int32_t* fl_out = flank_len + (size_t)i * nb_stride;
      int fp_used = 0;
      // gather pieces: left walk fragment per block (reversed), seed char,
      // right walk fragment per block (as-is)
      for (int b = 0; b < nb; ++b) {
        fo_out[b] = fp_used;
        // left piece for block b
        if (lv) {
          int prev = 0;
          for (int k = 0; k < w_nf[0]; ++k) {
            if (w_fb[0][k] == b) {
              int len = w_fe[0][k] - prev;
              for (int t = 0; t < len; ++t)
                fp_out[fp_used + t] = w_fragp[0][prev + len - 1 - t];
              fp_used += len;
            }
            prev = w_fe[0][k];
          }
        }
        const uint8_t stut = fw_walk->blk_is_stutter[b];
        if (b == seed_blk && !stut) fp_out[fp_used++] = seq[seed_base];
        if (rv) {
          int prev = 0;
          for (int k = 0; k < w_nf[1]; ++k) {
            if (nb - 1 - w_fb[1][k] == b) {
              int len = w_fe[1][k] - prev;
              for (int t = 0; t < len; ++t)
                fp_out[fp_used + t] = w_fragp[1][prev + t];
              fp_used += len;
            }
            prev = w_fe[1][k];
          }
        }
        fl_out[b] = fp_used - fo_out[b];
      }
      for (int b = nb; b < nb_stride; ++b) { fo_out[b] = 0; fl_out[b] = 0; }

      out_flank_ins[i] = w_fi[0] + w_fi[1];
      out_flank_del[i] = w_fd[0] + w_fd[1];

      // ---- read->haplotype op string: reverse(left) + 'M' + right --------
      read_aln.resize((size_t)(lv ? w_aln_len[0] : seed_base) + 1
                      + (rv ? w_aln_len[1] : rlen));
      int ra = 0;
      if (lv) {
        int ndel = 0;
        for (int t = w_aln_len[0] - 1; t >= 0; --t) {
          uint8_t c = w_aln[0][t];
          read_aln[ra++] = c;
          if (c == 'D') ++ndel;
        }
        if (ra - ndel != seed_base) { out_rc[i] = -22; continue; }
      } else {
        for (int t = 0; t < seed_base; ++t) read_aln[ra++] = 'S';
      }
      read_aln[ra++] = 'M';
      if (rv) {
        int ndel = 0;
        for (int t = 0; t < w_aln_len[1]; ++t) {
          uint8_t c = w_aln[1][t];
          read_aln[ra++] = c;
          if (c == 'D') ++ndel;
        }
        if (w_aln_len[1] - ndel != rlen) { out_rc[i] = -23; continue; }
      } else {
        for (int t = 0; t < rlen; ++t) read_aln[ra++] = 'S';
      }

      // ---- stitch through the haplotype->reference alignment -------------
      const int64_t off = (int64_t)i * cig_stride;
      out_rc[i] = stitch_trace(
          (const char*)hap_aln_ptrs[i], hap_lens[i],
          (const char*)read_aln.data(), ra,
          hap_starts[i], max_index, seed_base,
          (const char*)seq, L,
          out_start + i, out_stop + i,
          cigar_ops_pool + off, cigar_num_pool + off, n_cigar + i,
          aln_pool + off, aln_len + i);
    }
  };
  if (n_threads <= 1 || n < 2 * n_threads) {
    run_range(0, n);
  } else {
    std::vector<std::thread> threads;
    const int32_t chunk = (n + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
      const int32_t lo = t * chunk, hi2 = std::min(n, lo + chunk);
      if (lo >= hi2) break;
      threads.emplace_back(run_range, lo, hi2);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}
