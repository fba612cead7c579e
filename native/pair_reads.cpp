// Mate-pairing state machine over the filter cascade's columnar output.
//
// Semantics pinned to hipstr_tpu/pipeline/fast_filter.py's pairing loop and
// pipeline/processor.py::_valid_pairing (from-scratch ports of the
// reference's read_and_filter_reads mate maps + get_valid_pairings,
// reference: src/bam_processor.cpp:97-152, 183, 303-437).  One call pairs a
// whole locus (single-BAM case); the caller builds Python read objects only
// for the emitted rows.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Mapping {
  std::string chrom;
  int64_t pos;
  bool operator<(const Mapping& o) const {
    if (chrom != o.chrom) return chrom < o.chrom;
    return pos < o.pos;
  }
};

// parse "chrom,pos,..." entries split on ';' (XA: chr,±pos,CIGAR,NM;
// SA: rname,pos,strand,CIGAR,mapQ,NM;), mirroring the Python split logic
void parse_alts(const char* s, int32_t len, const std::string& prim_chrom,
                int64_t prim_pos, std::vector<Mapping>& out) {
  int32_t i = 0;
  while (i < len) {
    int32_t j = i;
    while (j < len && s[j] != ';') ++j;
    if (j > i) {
      // tokens split on ','
      int32_t c1 = i;
      while (c1 < j && s[c1] != ',') ++c1;
      int32_t c2 = c1 + 1;
      while (c2 < j && s[c2] != ',') ++c2;
      if (c1 < j) {
        std::string chrom(s + i, c1 - i);
        int64_t pos = std::strtoll(std::string(s + c1 + 1, c2 - c1 - 1).c_str(),
                                   nullptr, 10);
        if (pos < 0) pos = -pos;
        if (chrom != prim_chrom || std::llabs(pos - prim_pos) > 200)
          out.push_back(Mapping{std::move(chrom), pos});
      }
    }
    i = j + 1;
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.  Outputs: pair_str/pair_mate parallel row-index
// arrays (STR read, its mate), unpaired row indices (key-sorted), counts,
// and the too-many-reads flag.  Output arrays must hold >= n entries.
int32_t pair_filter_batch(
    const char* blob, int32_t n,
    const int64_t* name_off, const int32_t* name_len,
    const uint8_t* status, const uint8_t* overlaps,
    const uint8_t* pass_one,
    const int32_t* flag,
    const int64_t* pos, const int64_t* orig_pos,
    const int32_t* xa_off, const int32_t* xa_len,
    const int32_t* sa_off, const int32_t* sa_len,
    const int32_t* as_val, const uint8_t* as_has,
    const int32_t* xs_val, const uint8_t* xs_has,
    const char* chrom, int32_t chrom_len,
    int64_t max_mate_dist, int64_t max_reads, int32_t use_unpaired,
    int32_t* pair_str, int32_t* pair_mate, int32_t* n_pairs,
    int32_t* unpaired, int32_t* n_unpaired, uint8_t* too_many) {
  const std::string prim_chrom(chrom, chrom_len);

  auto first_mate = [&](int32_t i) { return (flag[i] & 0x40) != 0; };

  auto mappings = [&](int32_t i, bool use_trimmed) {
    std::vector<Mapping> out;
    out.push_back(Mapping{prim_chrom, use_trimmed ? pos[i] : orig_pos[i]});
    const int64_t p0 = out[0].pos;
    if (xa_off[i])
      parse_alts(blob + xa_off[i], xa_len[i], prim_chrom, p0, out);
    if (sa_off[i])
      parse_alts(blob + sa_off[i], sa_len[i], prim_chrom, p0, out);
    return out;
  };

  // _valid_pairing(a, m): `a` contributes its trimmed pos, `m` its original
  // mapping pos (processor.py:443-471)
  auto valid_pairing = [&](int32_t a, int32_t m) {
    const int32_t guard[2] = {m, a};
    for (int32_t x : guard) {
      if (!xa_off[x] && as_has[x] && xs_has[x] &&
          as_val[x] - xs_val[x] < 10)
        return false;
    }
    std::vector<Mapping> ma = mappings(a, true);
    std::vector<Mapping> mm = mappings(m, false);
    std::sort(ma.begin(), ma.end());
    std::sort(mm.begin(), mm.end());
    int32_t hits = 0;
    int64_t hit_pos = 0;
    for (const auto& m1 : ma)
      for (const auto& m2 : mm)
        if (m1.chrom == m2.chrom &&
            std::llabs(m1.pos - m2.pos) < max_mate_dist) {
          ++hits;
          hit_pos = m1.pos;
        }
    return hits == 1 && hit_pos == pos[a];
  };

  auto key_of = [&](int32_t i) {
    int32_t len = name_len[i];
    const char* nm = blob + name_off[i];
    if (len > 2 && nm[len - 2] == '/') len -= 2;
    return std::string(nm, len);
  };

  std::unordered_map<std::string, int32_t> pstrs, pmates;
  int32_t np_ = 0, nu_ = 0;
  *too_many = 0;
  for (int32_t i = 0; i < n; ++i) {
    if (status[i] == 0) continue;
    if (np_ > max_reads) {
      *too_many = 1;
      break;
    }
    if (status[i] != 4) continue;
    std::string key = key_of(i);
    if (overlaps[i]) {
      if (pass_one[i]) {
        auto it = pmates.find(key);
        if (it != pmates.end()) {
          const int32_t mate = it->second;
          pmates.erase(it);
          if (first_mate(mate) == first_mate(i)) {
            pstrs[key] = i;
            continue;
          }
          if (valid_pairing(i, mate)) {
            pair_str[np_] = i;
            pair_mate[np_] = mate;
            ++np_;
          }
        } else {
          auto it2 = pstrs.find(key);
          if (it2 != pstrs.end()) {
            const int32_t other = it2->second;
            if (first_mate(other) == first_mate(i)) continue;
            pstrs.erase(it2);
            if (valid_pairing(i, other)) {
              pair_str[np_] = i;
              pair_mate[np_] = other;
              ++np_;
              pair_str[np_] = other;
              pair_mate[np_] = i;
              ++np_;
            }
          } else {
            pstrs[key] = i;
          }
        }
      } else {
        pmates[key] = i;
      }
    } else {
      auto it2 = pstrs.find(key);
      if (it2 != pstrs.end()) {
        const int32_t other = it2->second;
        if (first_mate(other) == first_mate(i)) continue;
        pstrs.erase(it2);
        if (valid_pairing(other, i)) {
          pair_str[np_] = other;
          pair_mate[np_] = i;
          ++np_;
        }
      } else {
        auto pm = pmates.find(key);
        if (pm != pmates.end()) {
          if (first_mate(pm->second) != first_mate(i)) pmates.erase(pm);
        } else {
          pmates[key] = i;
        }
      }
    }
  }

  std::vector<std::pair<std::string, int32_t>> left(pstrs.begin(),
                                                    pstrs.end());
  std::sort(left.begin(), left.end());
  for (const auto& [k, i] : left) {
    if (xa_off[i]) continue;
    if (!use_unpaired) continue;
    unpaired[nu_++] = i;
  }
  *n_pairs = np_;
  *n_unpaired = nu_;
  return 0;
}

}  // extern "C"
