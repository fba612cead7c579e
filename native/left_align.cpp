// Batched convertAlignment for reference-matching reads.
//
// Semantics pinned to hipstr_tpu/align/realign.py::convert_alignment (the
// from-scratch port of the reference's AlignmentOps::convertAlignment,
// reference: src/SeqAlignment/AlignmentOps.cpp:102-167): M runs are split
// into =/X against the chromosome, soft clips are kept in the CIGAR but not
// in the gapped alignment string, deletions become '-' runs, and the end
// position is the last reference base consumed.  One call handles every
// unique reference-matching read of a locus, so the per-read Python cost of
// left alignment collapses into a single ctypes round trip.

#include <cstdint>
#include <cstring>

namespace {

inline char upc(char c) { return (c >= 'a' && c <= 'z') ? c - 32 : c; }

}  // namespace

extern "C" {

// Returns 0 on success, -1 if any read overflowed its output capacity or
// carried an unexpected CIGAR op (callers fall back to Python for the lot).
//
// Per-read outputs:
//   out_stop  : last reference position consumed (inclusive)
//   aln_pool  : gapped alignment string at aln_off[i], length aln_len[i]
//   oc_ops/oc_lens : output CIGAR elements at oc_off[i], count oc_cnt[i]
//   ok        : 1 when the row is valid
int32_t convert_aln_batch(
    const char* chrom_seq, int64_t chrom_len, int32_t n,
    const char* seq_pool, const int64_t* seq_off, const int32_t* seq_len,
    const int64_t* pos,
    const char* cig_ops, const int32_t* cig_lens,
    const int64_t* cig_off, const int32_t* cig_cnt,
    int64_t* out_stop,
    char* aln_pool, const int64_t* aln_off, int32_t* aln_len,
    char* oc_ops, int32_t* oc_lens, const int64_t* oc_off,
    const int32_t* oc_cap, int32_t* oc_cnt, uint8_t* ok) {
  int32_t rc = 0;
  for (int32_t i = 0; i < n; ++i) {
    ok[i] = 0;
    const char* seq = seq_pool + seq_off[i];
    const int32_t L = seq_len[i];
    const int64_t co = cig_off[i];
    const int32_t nc = cig_cnt[i];
    char* aln = aln_pool + aln_off[i];
    const int64_t aln_cap =
        (i + 1 < n ? aln_off[i + 1] : aln_off[i] + 2 * L + 64) - aln_off[i];
    char* ops = oc_ops + oc_off[i];
    int32_t* lens = oc_lens + oc_off[i];
    const int32_t cap = oc_cap[i];

    int32_t si = 0;        // index into the read sequence
    int64_t ri = pos[i];   // reference cursor
    int64_t ai = 0;        // alignment-string cursor
    int32_t ei = 0;        // output CIGAR cursor
    bool bad = false;
    for (int32_t e = 0; e < nc && !bad; ++e) {
      const char op = cig_ops[co + e];
      const int32_t len = cig_lens[co + e];
      switch (op) {
        case 'H':
          break;
        case 'S':
          if (ei >= cap) { bad = true; break; }
          ops[ei] = 'S'; lens[ei++] = len;
          si += len;
          break;
        case 'I':
          if (ei >= cap || ai + len > aln_cap || si + len > L) {
            bad = true; break;
          }
          ops[ei] = 'I'; lens[ei++] = len;
          for (int32_t k = 0; k < len; ++k) aln[ai + k] = upc(seq[si + k]);
          ai += len; si += len;
          break;
        case 'D':
          if (ei >= cap || ai + len > aln_cap) { bad = true; break; }
          ops[ei] = 'D'; lens[ei++] = len;
          std::memset(aln + ai, '-', len);
          ai += len; ri += len;
          break;
        case 'M': case '=': case 'X': {
          if (ai + len > aln_cap || si + len > L ||
              ri + len > chrom_len) { bad = true; break; }
          // split the run into =/X elements against the chromosome
          char run_op = 0;
          int32_t run_len = 0;
          for (int32_t k = 0; k < len; ++k) {
            const char rb = upc(seq[si + k]);
            aln[ai + k] = rb;
            const char cur = (rb == upc(chrom_seq[ri + k])) ? '=' : 'X';
            if (cur == run_op) {
              ++run_len;
            } else {
              if (run_len) {
                if (ei >= cap) { bad = true; break; }
                ops[ei] = run_op; lens[ei++] = run_len;
              }
              run_op = cur; run_len = 1;
            }
          }
          if (!bad && run_len) {
            if (ei >= cap) { bad = true; break; }
            ops[ei] = run_op; lens[ei++] = run_len;
          }
          ai += len; si += len; ri += len;
          break;
        }
        default:
          bad = true;
      }
    }
    if (bad) { rc = -1; continue; }
    out_stop[i] = ri - 1;
    aln_len[i] = static_cast<int32_t>(ai);
    oc_cnt[i] = ei;
    ok[i] = 1;
  }
  return rc;
}

// Split a decompressed BAM byte run into record bodies by their 4-byte
// length prefixes (io/bam.py fetch_raw).  Returns the number of records,
// or -1 if a record would need more bytes than `len` provides (the caller
// reads the tail and retries) or the output capacity is exceeded.
// tail_need receives the total byte length the final record requires when
// the return is -1 (0 for capacity overflow).
int64_t split_bam_records(const uint8_t* data, int64_t len,
                          int64_t* offs, int32_t* lens, int64_t cap,
                          int64_t* tail_need) {
  int64_t off = 0, n = 0;
  *tail_need = 0;
  while (off < len) {
    if (off + 4 > len) {
      *tail_need = off + 4;
      return -1;
    }
    const uint32_t sz = static_cast<uint32_t>(data[off]) |
                        (static_cast<uint32_t>(data[off + 1]) << 8) |
                        (static_cast<uint32_t>(data[off + 2]) << 16) |
                        (static_cast<uint32_t>(data[off + 3]) << 24);
    const int64_t end = off + 4 + static_cast<int64_t>(sz);
    if (end > len) {
      *tail_need = end;
      return -1;
    }
    if (n >= cap) return -1;
    offs[n] = off + 4;
    lens[n] = static_cast<int32_t>(sz);
    ++n;
    off = end;
  }
  return n;
}

}  // extern "C"
