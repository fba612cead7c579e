// Speculative-candidate scan: predicts the stutter-artifact repeat alleles
// and substitution alt flanks the adaptive loop is likely to add, from the
// raw left-aligned pooled reads, in one native call per locus.
//
// Semantics pinned to hipstr_tpu/pipeline/genotyper.py
// (_build_speculative_haplotype / _predict_flank_candidates, which in turn
// model the reference's mining loops: get_stutter_candidate_alleles
// reference src/seq_stutter_genotyper.cpp:843-879 and assemble_flanks
// :40-217).  Speculation is best-effort: the final VCF is exact whether or
// not a candidate is predicted, only the device-dispatch count changes, so
// this port must only preserve the hit rate, not bit-level behavior.  The
// threshold comparisons still use the same double-precision expressions as
// the Python so predicted sets stay identical in practice.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Pool {
  const char* seq;
  int32_t seq_len;
  int64_t start, stop;
  const char* ops;
  const int32_t* lens;
  int32_t n_cig;
};

// Port of align/alignment_data.py::extract_cigar_bp_diff (reference
// ExtractCigar, src/extract_indels.cpp:18-101).  Returns false where the
// Python returns None.
bool cigar_bp_diff(const Pool& p, int64_t region_start, int64_t region_end,
                   int64_t* out) {
  const int32_t n = p.n_cig;
  if (n == 0) return false;
  int64_t region_len = 0;
  for (int32_t i = 0; i < n; ++i) {
    const char t = p.ops[i];
    if (t == 'M' || t == '=' || t == 'X' || t == 'D') region_len += p.lens[i];
  }
  if (region_start < p.start) return false;
  if (region_end >= p.start + region_len) return false;

  int64_t pos = p.start;
  int32_t start_index = 0, last_match = 0;
  while (pos < region_start && start_index < n) {
    const char t = p.ops[start_index];
    if (t == 'M' || t == '=' || t == 'X' || t == 'D') pos += p.lens[start_index];
    if (t == 'M' || t == '=' || t == 'X') last_match = start_index;
    ++start_index;
  }
  start_index = last_match;
  {
    const char t = p.ops[start_index];
    if (start_index == 0 && !(t == 'M' || t == '=' || t == 'X')) return false;
  }
  int32_t end_index = n - 1;
  last_match = n - 1;
  pos = p.start + region_len;
  while (pos > region_end) {
    const char t = p.ops[end_index];
    if (t == 'M' || t == '=' || t == 'X' || t == 'D') pos -= p.lens[end_index];
    if (t == 'M' || t == '=' || t == 'X') last_match = end_index;
    if (end_index == 0) break;
    --end_index;
  }
  end_index = last_match;
  {
    const char t = p.ops[end_index];
    if (end_index == n - 1 && !(t == 'M' || t == '=' || t == 'X')) return false;
  }
  int64_t diff = 0;
  for (int32_t i = start_index; i <= end_index; ++i) {
    if (p.ops[i] == 'D') diff -= p.lens[i];
    else if (p.ops[i] == 'I') diff += p.lens[i];
  }
  *out = diff;
  return true;
}

// Port of the Python read_index_at closure (genotyper.py), including its
// quirk of not advancing the read index over soft clips.
int64_t read_index_at(const Pool& p, int64_t ref_pos) {
  if (p.n_cig == 1 &&
      (p.ops[0] == 'M' || p.ops[0] == '=' || p.ops[0] == 'X')) {
    if (p.start <= ref_pos && ref_pos < p.start + p.lens[0])
      return ref_pos - p.start;
    return -1;
  }
  int64_t pos = p.start, ridx = 0;
  for (int32_t i = 0; i < p.n_cig; ++i) {
    const char t = p.ops[i];
    const int32_t num = p.lens[i];
    if (t == 'M' || t == '=' || t == 'X') {
      if (pos <= ref_pos && ref_pos < pos + num) return ridx + (ref_pos - pos);
      pos += num;
      ridx += num;
    } else if (t == 'I') {
      ridx += num;
    } else if (t == 'D') {
      if (pos <= ref_pos && ref_pos < pos + num) return -1;
      pos += num;
    }
  }
  return -1;
}

// Port of the Python _flank_segment helper.
bool flank_segment(const Pool& p, int64_t bstart, int64_t bend,
                   int64_t* out_lo, int64_t* out_hi, int64_t* out_rlo) {
  const int64_t lo = std::max(bstart, p.start);
  const int64_t hi = std::min(bend, p.stop + 1);
  if (lo >= hi) return false;
  int64_t pos = p.start, ridx = 0, read_lo = -1;
  for (int32_t i = 0; i < p.n_cig; ++i) {
    const char t = p.ops[i];
    const int64_t num = p.lens[i];
    if (t == '=' || t == 'X' || t == 'M') {
      if (pos <= lo && lo < pos + num) read_lo = ridx + (lo - pos);
      pos += num;
      ridx += num;
    } else if (t == 'I') {
      if (lo < pos && pos < hi) return false;
      ridx += num;
    } else if (t == 'D') {
      if (pos < hi && pos + num > lo) return false;
      pos += num;
    } else if (t == 'S') {
      ridx += num;
    }
    if (pos >= hi) break;
  }
  if (read_lo < 0) return false;
  *out_lo = lo;
  *out_hi = hi;
  *out_rlo = read_lo;
  return true;
}

// insertion-ordered accumulation map (mirrors Python dict iteration order)
template <typename K>
struct OrderedCounter {
  std::unordered_map<K, int32_t> index;
  std::vector<std::pair<K, int64_t>> items;
  void add(const K& k, int64_t v) {
    auto it = index.find(k);
    if (it == index.end()) {
      index.emplace(k, static_cast<int32_t>(items.size()));
      items.emplace_back(k, v);
    } else {
      items[it->second].second += v;
    }
  }
};

struct Emitter {
  char* pool;
  int64_t cap, used = 0;
  int32_t* blk;
  int64_t* off;
  int32_t* len;
  int64_t* support;
  int32_t max_out, cnt = 0;
  bool overflow = false;
  void emit(int32_t block_slot, const std::string& s, int64_t sup) {
    if (cnt >= max_out || used + static_cast<int64_t>(s.size()) > cap) {
      overflow = true;
      return;
    }
    std::memcpy(pool + used, s.data(), s.size());
    blk[cnt] = block_slot;
    off[cnt] = used;
    len[cnt] = static_cast<int32_t>(s.size());
    support[cnt] = sup;
    used += static_cast<int64_t>(s.size());
    ++cnt;
  }
};

}  // namespace

extern "C" {

// Returns 0 on success, -1 on output overflow (caller falls back to the
// Python predictors).  Candidates are emitted with their raw support;
// ordering/budget/thresholding across candidates stays in Python.
//
// Block slots in `out_blk`: repeat block r -> r, flank block f -> NRB + f.
int32_t spec_scan(
    int32_t P, int32_t S,
    const char* seq_pool, const int64_t* seq_off, const int32_t* seq_len,
    const int64_t* p_start, const int64_t* p_stop,
    const char* cig_ops, const int32_t* cig_lens,
    const int64_t* cig_off, const int32_t* cig_cnt,
    const int64_t* ps_counts,  // P x S row-major read weights
    // repeat blocks
    int32_t NRB, const int64_t* rb_start, const int64_t* rb_end,
    const int32_t* rb_period,
    const char* rb_opts_pool, const int64_t* rb_opt_off,
    const int32_t* rb_opt_len, const int32_t* rb_opt_first,
    const int32_t* rb_opt_cnt,
    // flank blocks
    int32_t NFB, const int64_t* fb_start, const int32_t* fb_len,
    const char* fb_ref_pool, const int64_t* fb_ref_off,
    // outputs
    char* out_pool, int64_t out_cap, int32_t* out_blk, int64_t* out_off,
    int32_t* out_len, int64_t* out_support, int32_t out_max,
    int32_t* out_cnt) {
  std::vector<Pool> pools(P);
  for (int32_t p = 0; p < P; ++p) {
    pools[p] = Pool{seq_pool + seq_off[p], seq_len[p], p_start[p], p_stop[p],
                    cig_ops + cig_off[p], cig_lens + cig_off[p], cig_cnt[p]};
  }
  Emitter em{out_pool, out_cap, 0, out_blk, out_off, out_len,
             out_support, out_max, 0, false};

  // ---------------------------------------------------------- repeat blocks
  for (int32_t b = 0; b < NRB; ++b) {
    const int32_t period = rb_period[b];
    const int64_t bstart = rb_start[b], bend = rb_end[b];
    const int32_t max_art = 6 * period;
    const int32_t n_opts = rb_opt_cnt[b];
    std::vector<std::string> opts(n_opts);
    for (int32_t o = 0; o < n_opts; ++o) {
      const int32_t oi = rb_opt_first[b] + o;
      opts[o].assign(rb_opts_pool + rb_opt_off[oi], rb_opt_len[oi]);
    }
    const std::string& ref_opt = opts[0];
    const int64_t ref_len = static_cast<int64_t>(ref_opt.size());
    const int64_t lo = bstart - period - 8, hi = bend + period + 8;
    // periodic extension template of the reference option
    std::string tmpl = ref_opt;
    for (int32_t k = 0; k < max_art + period; ++k)
      tmpl.push_back(tmpl[tmpl.size() - period]);

    std::vector<OrderedCounter<int64_t>> diff_counts(S);
    std::vector<OrderedCounter<std::string>> seq_counts(S);
    std::vector<int64_t> span(S, 0);
    for (int32_t p = 0; p < P; ++p) {
      const Pool& pl = pools[p];
      if (!(pl.start < bstart && pl.stop > bend)) continue;
      const int64_t* w = ps_counts + static_cast<int64_t>(p) * S;
      for (int32_t s = 0; s < S; ++s) span[s] += w[s];
      int64_t diff;
      if (cigar_bp_diff(pl, lo, hi, &diff) && diff != 0) {
        for (int32_t s = 0; s < S; ++s)
          if (w[s]) diff_counts[s].add(diff, w[s]);
      }
      const int64_t anchor = read_index_at(pl, bstart);
      if (anchor < 0) continue;
      const int64_t limit = std::min<int64_t>(pl.seq_len - anchor,
                                              static_cast<int64_t>(tmpl.size()));
      const char* rb = pl.seq + anchor;
      // mismatch walk: tolerate up to 2 isolated in-repeat SNPs when the
      // periodic phase resumes right after each
      std::vector<int64_t> neq;
      for (int64_t j = 0; j < limit; ++j)
        if (rb[j] != tmpl[j]) neq.push_back(j);
      int64_t k = limit;
      int32_t mism = 0;
      for (size_t j = 0; j < neq.size(); ++j) {
        const int64_t m = neq[j];
        const int64_t la = std::min<int64_t>(period, limit - (m + 1));
        const int64_t nxt = (j + 1 < neq.size()) ? neq[j + 1] : limit;
        if (mism < 2 && la >= 1 && nxt > m + la) {
          ++mism;
          continue;
        }
        k = m;
        break;
      }
      if (k >= period && k < pl.seq_len - anchor) {
        for (int32_t o = 0; o < n_opts; ++o) {
          const int64_t Lo = static_cast<int64_t>(opts[o].size());
          const int64_t rem = ((k - Lo) % period + period) % period;
          const int64_t Lp = k - rem;
          if (Lp >= period && Lp != Lo && std::llabs(Lp - Lo) <= max_art) {
            std::string run(rb, rb + Lp);
            for (int32_t s = 0; s < S; ++s)
              if (w[s]) seq_counts[s].add(run, w[s]);
          }
        }
      }
    }
    auto contains = [&](const std::string& q) {
      for (const auto& o : opts)
        if (o == q) return true;
      return false;
    };
    OrderedCounter<std::string> support;
    for (int32_t s = 0; s < S; ++s) {
      for (const auto& [diff, cnt] : diff_counts[s].items) {
        if (diff == 0 || cnt < 2 ||
            static_cast<double>(cnt) < 0.10 * static_cast<double>(span[s]))
          continue;
        const int64_t target_len = ref_len + diff;
        for (const auto& opt : opts) {
          const int64_t delta = target_len - static_cast<int64_t>(opt.size());
          if (delta == 0 || delta % period != 0 || std::llabs(delta) > max_art)
            continue;
          // periodic_variants(opt, delta)
          std::vector<std::string> cands;
          if (delta < 0) {
            if (static_cast<int64_t>(opt.size()) + delta > 0) {
              cands.push_back(opt.substr(opt.size() + delta));
              cands.push_back(opt.substr(0, opt.size() + delta));
            }
          } else {
            std::string ext = opt;
            for (int64_t t = 0; t < delta; ++t)
              ext.push_back(ext[ext.size() - period]);
            std::string front = opt;
            for (int64_t t = 0; t < delta; ++t) {
              const char c = front[period - 1];
              front.insert(front.begin(), c);
            }
            cands.push_back(ext);
            cands.push_back(front);
          }
          for (const auto& cand : cands)
            if (!cand.empty() && !contains(cand)) support.add(cand, cnt);
        }
      }
      for (const auto& [seq, cnt] : seq_counts[s].items) {
        if (cnt < 2 ||
            static_cast<double>(cnt) < 0.10 * static_cast<double>(span[s]) ||
            contains(seq))
          continue;
        bool any = false;
        for (const auto& o : opts) {
          const int64_t d = static_cast<int64_t>(seq.size()) -
                            static_cast<int64_t>(o.size());
          if (d != 0 && std::llabs(d) <= max_art && d % period == 0) {
            any = true;
            break;
          }
        }
        if (any) support.add(seq, cnt);
      }
    }
    for (const auto& [cand, sup] : support.items) em.emit(b, cand, sup);
  }

  // ----------------------------------------------------------- flank blocks
  for (int32_t f = 0; f < NFB; ++f) {
    const int64_t bstart = fb_start[f];
    const int32_t blen = fb_len[f];
    if (blen < 2) continue;
    const char* ref_b = fb_ref_pool + fb_ref_off[f];
    const int64_t bend = bstart + blen;
    // coverage per (offset, sample) via diff array + full-span fast path
    std::vector<int64_t> cov_diff(static_cast<size_t>(blen + 1) * S, 0);
    std::vector<int64_t> full_cov(S, 0);
    std::vector<OrderedCounter<int64_t>> alt_counts(S);  // key off*256+base
    for (int32_t p = 0; p < P; ++p) {
      const Pool& pl = pools[p];
      const bool pure = (pl.n_cig == 1 && pl.ops[0] == '=');
      const int64_t* w = ps_counts + static_cast<int64_t>(p) * S;
      if (pure) {
        const int64_t lo_v = std::max(bstart, pl.start);
        const int64_t hi_v = std::min(bend, pl.stop + 1);
        if (lo_v >= hi_v) continue;
        if (lo_v == bstart && hi_v == bend) {
          for (int32_t s = 0; s < S; ++s) full_cov[s] += w[s];
        } else {
          for (int32_t s = 0; s < S; ++s) {
            cov_diff[static_cast<size_t>(lo_v - bstart) * S + s] += w[s];
            cov_diff[static_cast<size_t>(hi_v - bstart) * S + s] -= w[s];
          }
        }
        continue;
      }
      int64_t lo, hi, rlo;
      if (!flank_segment(pl, bstart, bend, &lo, &hi, &rlo)) continue;
      for (int32_t s = 0; s < S; ++s) {
        cov_diff[static_cast<size_t>(lo - bstart) * S + s] += w[s];
        cov_diff[static_cast<size_t>(hi - bstart) * S + s] -= w[s];
      }
      const char* sb = pl.seq + rlo;
      for (int64_t j = 0; j < hi - lo; ++j) {
        if (sb[j] != ref_b[j + (lo - bstart)]) {
          const int64_t key = (j + (lo - bstart)) * 256 +
                              static_cast<uint8_t>(sb[j]);
          for (int32_t s = 0; s < S; ++s)
            if (w[s]) alt_counts[s].add(key, w[s]);
        }
      }
    }
    bool any_alt = false;
    for (int32_t s = 0; s < S; ++s) any_alt |= !alt_counts[s].items.empty();
    if (!any_alt) continue;
    // prefix-sum coverage
    std::vector<int64_t> cov(static_cast<size_t>(blen) * S, 0);
    std::vector<int64_t> run(S, 0);
    for (int32_t o = 0; o < blen; ++o) {
      for (int32_t s = 0; s < S; ++s) {
        run[s] += cov_diff[static_cast<size_t>(o) * S + s];
        cov[static_cast<size_t>(o) * S + s] = run[s] + full_cov[s];
      }
    }
    OrderedCounter<std::string> support;
    for (int32_t s = 0; s < S; ++s) {
      std::string alt(ref_b, ref_b + blen);
      int64_t total = 0;
      bool have = false;
      for (const auto& [key, cnt] : alt_counts[s].items) {
        const int64_t off = key / 256;
        const char base = static_cast<char>(key % 256);
        if (cnt >= 2 &&
            static_cast<double>(cnt) >
                0.25 * static_cast<double>(
                           cov[static_cast<size_t>(off) * S + s])) {
          alt[off] = base;
          total += cnt;
          have = true;
        }
      }
      if (have && alt.compare(0, blen, ref_b, blen) != 0)
        support.add(alt, total);
    }
    for (const auto& [cand, sup] : support.items) em.emit(NRB + f, cand, sup);
  }

  *out_cnt = em.cnt;
  return em.overflow ? -1 : 0;
}

// Batched seed-base selection for the pooled reads (semantics
// pipeline/genotyper.py calc_seed_base / calc_best_seed_position;
// reference HapAligner.cpp:238-318).  seeds[i]: the seed base, or
// -2 -> "Invalid alignment seed" (RuntimeError), -3 -> unrecognized CIGAR
// op (AssertionError) — the caller re-raises to keep skip-and-continue
// behavior identical.
int32_t seed_scan(
    int32_t P,
    const int64_t* p_start, const int32_t* seq_len,
    const char* cig_ops, const int32_t* cig_lens,
    const int64_t* cig_off, const int32_t* cig_cnt,
    int32_t n_rep, const int64_t* rep_start, const int64_t* rep_end,
    int64_t hap_start, int64_t hap_end, int32_t min_seed_dist,
    int64_t* seeds) {
  auto best_seed_position = [&](int64_t region_start, int64_t region_end,
                                int64_t* out_pos) {
    int64_t best_dist = -1, best_pos = -1;
    int64_t pos = region_start;
    int32_t ri = 0;
    while (ri < n_rep && pos <= region_end) {
      if (pos < rep_start[ri]) {
        const int64_t dist =
            1 + (std::min(region_end, rep_start[ri] - 1) - pos) / 2;
        if (dist >= best_dist) {
          best_dist = dist;
          best_pos = dist - 1 + pos;
        }
        pos = rep_end[ri];
        ++ri;
      } else if (pos < rep_end[ri]) {
        pos = rep_end[ri];
        ++ri;
      } else {
        ++ri;
      }
    }
    if (pos <= region_end) {
      const int64_t dist = 1 + (region_end - pos) / 2;
      if (dist >= best_dist) {
        best_dist = dist;
        best_pos = dist - 1 + pos;
      }
    }
    *out_pos = best_pos;
    return best_dist;
  };

  for (int32_t p = 0; p < P; ++p) {
    int64_t pos = p_start[p];
    int64_t best_seed = -1, cur_base = 0, max_dist = min_seed_dist;
    bool bad_op = false;
    const char* ops = cig_ops + cig_off[p];
    const int32_t* lens = cig_lens + cig_off[p];
    for (int32_t e = 0; e < cig_cnt[p]; ++e) {
      const char t = ops[e];
      const int64_t num = lens[e];
      if (t == '=') {
        const int64_t min_region = std::max(pos, hap_start);
        const int64_t max_region = std::min(pos + num - 1, hap_end - 1);
        if (min_region <= max_region) {
          int64_t dist_pos;
          const int64_t dist =
              best_seed_position(min_region, max_region, &dist_pos);
          if (dist >= max_dist) {
            max_dist = dist;
            best_seed = cur_base + (dist_pos - pos);
          }
        }
        pos += num;
        cur_base += num;
      } else if (t == 'I') {
        cur_base += num;
      } else if (t == 'X') {
        pos += num;
        cur_base += num;
      } else if (t == 'D') {
        pos += num;
      } else {
        bad_op = true;
        break;
      }
    }
    if (bad_op) {
      seeds[p] = -3;
    } else if (best_seed < -1 || best_seed == 0 ||
               best_seed >= seq_len[p] - 1) {
      seeds[p] = -2;
    } else {
      seeds[p] = best_seed;
    }
  }
  return 0;
}

}  // extern "C"
