// Native host kernels for hipstr_tpu: Needleman-Wunsch realignment and BGZF
// block inflation.  Exposed through a plain C ABI consumed via ctypes
// (hipstr_tpu/native.py).
//
// The aligner reproduces the semantics of hipstr_tpu/align/nw.py (which in
// turn matches the reference aligner's scoring and tie-breaking,
// reference: src/SeqAlignment/NeedlemanWunsch.cpp): match +2, mismatch -2,
// gap open 5, gap extend 0.125, N matches everything, free leading/trailing
// reference gaps unless use_ref_end_penalty.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

constexpr float MATCH = 2.0f;
constexpr float MISMATCH = -2.0f;
constexpr float GAPOPEN = 5.0f;
constexpr float GAPEXTEND = 0.125f;
constexpr float BIG = 1000000.0f;

inline int base_code(char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
  }
}

inline float score(int a, int b) {
  if (a == 4 || b == 4) return MATCH;
  return a == b ? MATCH : MISMATCH;
}

// Tie-break identical to the reference bestIndex
// (NeedlemanWunsch.cpp:120-141): prefer s3 on s2/s3 ties, s1 when it is the
// (weak) maximum.
inline int best3(float s1, float s2, float s3) {
  if (s2 > s1) return (s2 > s3) ? 1 : 2;
  return (s3 > s1) ? 2 : 0;
}

}  // namespace

extern "C" {

// Aligns read against ref.  Outputs gapped alignment strings (caller buffers
// must hold ref_len + read_len + 1 bytes).  Returns the alignment score, or
// a large negative value on buffer overflow.
float nw_align(const char* ref, int32_t L1, const char* read, int32_t L2,
               int32_t use_ref_end_penalty, char* ref_al, char* read_al,
               int32_t* out_len) {
  const int W = L1 + 1;
  std::vector<float> M(static_cast<size_t>(L2 + 1) * W, -BIG);
  std::vector<float> Iref(static_cast<size_t>(L2 + 1) * W, -BIG);
  std::vector<float> Iread(static_cast<size_t>(L2 + 1) * W, -BIG);

  std::vector<int> rc(L1), qc(L2);
  for (int j = 0; j < L1; ++j) rc[j] = base_code(ref[j]);
  for (int i = 0; i < L2; ++i) qc[i] = base_code(read[i]);

  M[0] = 0.0f;
  for (int j = 1; j <= L1; ++j)
    Iref[j] = use_ref_end_penalty ? (-GAPOPEN - (j - 1) * GAPEXTEND) : 0.0f;
  for (int i = 1; i <= L2; ++i)
    Iread[static_cast<size_t>(i) * W] = -GAPOPEN - (i - 1) * GAPEXTEND;

  for (int i = 1; i <= L2; ++i) {
    const size_t row = static_cast<size_t>(i) * W;
    const size_t prev = row - W;
    const int q = qc[i - 1];
    for (int j = 1; j <= L1; ++j) {
      const float diag =
          std::max(M[prev + j - 1], std::max(Iref[prev + j - 1],
                                             Iread[prev + j - 1]));
      M[row + j] = diag + score(rc[j - 1], q);
      Iread[row + j] = std::max(M[prev + j] - GAPOPEN,
                                std::max(Iref[prev + j] - GAPOPEN,
                                         Iread[prev + j] - GAPEXTEND));
      Iref[row + j] = std::max(M[row + j - 1] - GAPOPEN,
                               std::max(Iread[row + j - 1] - GAPOPEN,
                                        Iref[row + j - 1] - GAPEXTEND));
    }
  }

  // optimal stop (reference findOptimalStop[EndPenalty] scan order)
  float best_val;
  int best_col, best_type;
  const size_t last = static_cast<size_t>(L2) * W;
  if (use_ref_end_penalty) {
    best_col = L1;
    best_val = M[last + L1];
    best_type = 0;
    if (Iref[last + L1] > best_val) { best_val = Iref[last + L1]; best_type = 1; }
    if (Iread[last + L1] > best_val) { best_val = Iread[last + L1]; best_type = 2; }
  } else {
    best_val = -BIG; best_col = -1; best_type = -1;
    for (int col = 0; col <= L1; ++col) {
      if (M[last + col] >= best_val) { best_val = M[last + col]; best_col = col; best_type = 0; }
      if (Iref[last + col] > best_val) { best_val = Iref[last + col]; best_col = col; best_type = 1; }
      if (Iread[last + col] > best_val) { best_val = Iread[last + col]; best_col = col; best_type = 2; }
    }
  }

  // traceback (decisions recomputed from the score matrices)
  std::vector<char> ra, qa;
  ra.reserve(L1 + L2);
  qa.reserve(L1 + L2);
  for (int j = L1; j > best_col; --j) { ra.push_back(ref[j - 1]); qa.push_back('-'); }
  int row_i = L2, col = best_col, typ = best_type;
  while (row_i > 0) {
    const size_t row = static_cast<size_t>(row_i) * W;
    const size_t prev = row - W;
    if (typ == 0) {
      ra.push_back(ref[col - 1]);
      qa.push_back(read[row_i - 1]);
      typ = best3(M[prev + col - 1], Iref[prev + col - 1], Iread[prev + col - 1]);
      --row_i; --col;
    } else if (typ == 1) {
      ra.push_back(ref[col - 1]);
      qa.push_back('-');
      typ = best3(M[row + col - 1] - GAPOPEN, Iref[row + col - 1] - GAPEXTEND,
                  Iread[row + col - 1] - GAPOPEN);
      --col;
    } else {
      ra.push_back('-');
      qa.push_back(read[row_i - 1]);
      typ = best3(M[prev + col] - GAPOPEN, Iref[prev + col] - GAPOPEN,
                  Iread[prev + col] - GAPEXTEND);
      --row_i;
    }
  }
  for (int j = col; j > 0; --j) { ra.push_back(ref[j - 1]); qa.push_back('-'); }

  const int n = static_cast<int>(ra.size());
  for (int k = 0; k < n; ++k) {
    ref_al[k] = ra[n - 1 - k];
    read_al[k] = qa[n - 1 - k];
  }
  ref_al[n] = '\0';
  read_al[n] = '\0';
  *out_len = n;
  return best_val;
}

// Inflate a whole BGZF byte stream into out (caller-sized).  Returns the
// number of decompressed bytes, or -1 on error / overflow.
int64_t bgzf_inflate_all(const uint8_t* data, int64_t len, uint8_t* out,
                         int64_t out_cap) {
  int64_t ip = 0, op = 0;
  while (ip + 18 <= len) {
    if (data[ip] != 0x1f || data[ip + 1] != 0x8b) return -1;
    const int xlen = data[ip + 10] | (data[ip + 11] << 8);
    int bsize = -1;
    int64_t xp = ip + 12;
    const int64_t xend = xp + xlen;
    while (xp + 4 <= xend) {
      const int si1 = data[xp], si2 = data[xp + 1];
      const int slen = data[xp + 2] | (data[xp + 3] << 8);
      if (si1 == 0x42 && si2 == 0x43)
        bsize = (data[xp + 4] | (data[xp + 5] << 8)) + 1;
      xp += 4 + slen;
    }
    if (bsize <= 0) return -1;
    const int64_t payload_off = ip + 12 + xlen;
    const int64_t payload_len = bsize - 12 - xlen - 8;
    if (payload_off + payload_len + 8 > len) return -1;

    const uint32_t isize =
        static_cast<uint32_t>(data[ip + bsize - 4]) |
        (static_cast<uint32_t>(data[ip + bsize - 3]) << 8) |
        (static_cast<uint32_t>(data[ip + bsize - 2]) << 16) |
        (static_cast<uint32_t>(data[ip + bsize - 1]) << 24);
    if (op + isize > out_cap) return -1;

    if (isize > 0) {
      z_stream zs;
      std::memset(&zs, 0, sizeof(zs));
      if (inflateInit2(&zs, -15) != Z_OK) return -1;
      zs.next_in = const_cast<uint8_t*>(data + payload_off);
      zs.avail_in = static_cast<uInt>(payload_len);
      zs.next_out = out + op;
      zs.avail_out = static_cast<uInt>(isize);
      const int ret = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (ret != Z_STREAM_END) return -1;
      op += isize;
    }
    ip += bsize;
  }
  return op;
}

}  // extern "C"
