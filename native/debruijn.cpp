// De Bruijn assembly of STR-flanking sequences, batched per locus.
//
// Native port of hipstr_tpu/align/debruijn.py (capability parity with the
// reference src/debruijn_graph.{h,cpp} + src/directed_graph.{h,cpp}): kmer
// graph seeded with the reference path at weight 2, per-read strings at
// weight 1, pruning of low-frequency non-reference edges, acyclicity and
// source/sink checks with 1bp-mismatch alternate kmers, best-first
// (bottleneck-weight) path enumeration.  One call runs EVERY sample's
// k-escalation loop for one flank block, replacing the per-sample Python
// graph work of SeqStutterGenotyper._assemble_flank_candidates (reference
// driver: src/seq_stutter_genotyper.cpp:40-217).
//
// Exact-semantics notes (mirrors the python module, asserted by
// tests/test_native.py parity cases):
//   * num_strings counts the reference seed add and every read string
//     LONGER than k (shorter adds are no-ops that do not count);
//   * prune threshold = max(min_weight, ceil(min_edge_freq*num_strings)),
//     reference edges never pruned;
//   * path order = bottleneck weight desc, FIFO among ties; at most
//     max_paths paths, edges below min_path_weight not traversed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Graph {
  int k;
  std::unordered_map<std::string, int> ids;
  std::vector<std::vector<int>> out_to;       // node -> successor node ids
  std::vector<std::vector<int>> out_w;        // parallel weights
  std::vector<int> in_deg;
  std::vector<std::string> label;
  std::vector<std::vector<uint8_t>> is_ref;   // per out-edge: reference?
  int num_strings = 0;
  int source = -1, sink = -1;

  int node(const char* s, int n) {
    auto it = ids.find(std::string(s, n));
    if (it != ids.end()) return it->second;
    int id = (int)label.size();
    ids.emplace(std::string(s, n), id);
    label.emplace_back(s, n);
    out_to.emplace_back();
    out_w.emplace_back();
    is_ref.emplace_back();
    in_deg.push_back(0);
    return id;
  }

  int find(const std::string& s) const {
    auto it = ids.find(s);
    return it == ids.end() ? -1 : it->second;
  }

  void add_edge(int u, int v, int w, bool ref_pass) {
    auto& to = out_to[u];
    for (size_t i = 0; i < to.size(); ++i) {
      if (to[i] == v) {
        out_w[u][i] += w;
        if (ref_pass) is_ref[u][i] = 1;
        return;
      }
    }
    to.push_back(v);
    out_w[u].push_back(w);
    is_ref[u].push_back(ref_pass ? 1 : 0);
    ++in_deg[v];
  }

  void add_string(const char* s, int n, int w, bool ref_pass) {
    if (n <= k) return;
    ++num_strings;
    int prev = node(s, k);
    for (int i = 1; i + k <= n; ++i) {
      int nxt = node(s + i, k);
      add_edge(prev, nxt, w, ref_pass);
      prev = nxt;
    }
  }

  void prune(double min_edge_freq, int min_weight) {
    const int thresh = std::max(
        min_weight, (int)std::ceil(min_edge_freq * num_strings));
    for (size_t u = 0; u < out_to.size(); ++u) {
      auto& to = out_to[u];
      auto& w = out_w[u];
      auto& rf = is_ref[u];
      size_t j = 0;
      for (size_t i = 0; i < to.size(); ++i) {
        if (!rf[i] && w[i] < thresh) {
          --in_deg[to[i]];
          continue;
        }
        to[j] = to[i];
        w[j] = w[i];
        rf[j] = rf[i];
        ++j;
      }
      to.resize(j);
      w.resize(j);
      rf.resize(j);
    }
  }

  bool has_cycles() const {
    const int N = (int)label.size();
    std::vector<uint8_t> color(N, 0);              // 0 white 1 gray 2 black
    std::vector<std::pair<int, size_t>> stack;
    for (int s0 = 0; s0 < N; ++s0) {
      if (color[s0]) continue;
      stack.clear();
      stack.push_back({s0, 0});
      color[s0] = 1;
      while (!stack.empty()) {
        auto& top = stack.back();
        const auto& to = out_to[top.first];
        bool advanced = false;
        while (top.second < to.size()) {
          int nxt = to[top.second++];
          if (color[nxt] == 1) return true;
          if (color[nxt] == 0) {
            color[nxt] = 1;
            stack.push_back({nxt, 0});
            advanced = true;
            break;
          }
        }
        if (!advanced && (stack.back().second >= out_to[stack.back().first]
                          .size())) {
          color[stack.back().first] = 2;
          stack.pop_back();
        }
      }
    }
    return false;
  }

  void alt_nodes(const std::string& kmer, bool source_rule, bool sink_rule,
                 std::vector<int>* out) const {
    static const char B[4] = {'A', 'C', 'G', 'T'};
    std::string alt = kmer;
    for (size_t i = 0; i < kmer.size(); ++i) {
      const char orig = alt[i];
      for (char b : B) {
        if (b == orig) continue;
        alt[i] = b;
        int id = find(alt);
        if (id >= 0) {
          if (source_rule && in_deg[id] > 0) continue;
          if (sink_rule && !out_to[id].empty()) continue;
          out->push_back(id);
        }
      }
      alt[i] = orig;
    }
  }
};

struct HeapEnt {
  int minw;
  long long counter;
  int node;
  std::string prefix;
};
struct HeapCmp {
  bool operator()(const HeapEnt& a, const HeapEnt& b) const {
    if (a.minw != b.minw) return a.minw < b.minw;   // max-heap on minw
    return a.counter > b.counter;                   // FIFO among ties
  }
};

}  // namespace

extern "C" {

// Per-sample flank assembly with internal k escalation.
//
// inputs:
//   ref_seq/ref_len, min_k..max_k (inclusive), n_samples,
//   strings: blob + per-string (off, len, sample) over n_strings
//   call_skip[s] != 0 -> skip sample (already filtered)
//   min_edge_freq, prune_min_weight, min_path_weight, max_paths
// outputs (per sample):
//   ok[s]: 1 = acyclic graph found (paths valid), 0 = cyclic at every k
//   n_paths[s], and for each path p < n_paths[s]:
//     seqs at seq_pool[s * max_paths * seq_stride + p * seq_stride],
//     seq_len[s * max_paths + p], weight[s * max_paths + p]
//   rc[s]: 0 ok, 1 = output overflow (python fallback for that sample)
int flank_assembly_batch(
    const char* ref_seq, int32_t ref_len, int32_t min_k, int32_t max_k,
    int32_t n_samples, const char* blob, const int64_t* str_off,
    const int32_t* str_len, const int32_t* str_sample, int64_t n_strings,
    const uint8_t* call_skip, double min_edge_freq,
    int32_t prune_min_weight, int32_t min_path_weight, int32_t max_paths,
    int64_t seq_stride, uint8_t* ok, int32_t* n_paths, char* seq_pool,
    int32_t* seq_len, int32_t* weight, uint8_t* rc) {
  // bucket string indices per sample
  std::vector<std::vector<int64_t>> by_sample(n_samples);
  for (int64_t i = 0; i < n_strings; ++i) {
    const int s = str_sample[i];
    if (s >= 0 && s < n_samples) by_sample[s].push_back(i);
  }

  for (int s = 0; s < n_samples; ++s) {
    ok[s] = 0;
    n_paths[s] = 0;
    rc[s] = 0;
    if (call_skip[s]) continue;
    for (int k = min_k; k <= max_k; ++k) {
      if (ref_len <= k) break;
      Graph g;
      g.k = k;
      g.add_string(ref_seq, ref_len, 2, true);
      g.source = g.find(std::string(ref_seq, k));
      g.sink = g.find(std::string(ref_seq + ref_len - k, k));
      for (int64_t si : by_sample[s])
        g.add_string(blob + str_off[si], str_len[si], 1, false);
      g.prune(min_edge_freq, prune_min_weight);
      // single acceptance condition (python: not has_cycles() and
      // is_source_ok() and is_sink_ok()); any failure escalates k
      if (g.has_cycles()) continue;
      if (g.source < 0 || g.out_to[g.source].empty() ||
          g.in_deg[g.source] != 0)
        continue;
      if (g.sink < 0 || !g.out_to[g.sink].empty() || g.in_deg[g.sink] == 0)
        continue;
      ok[s] = 1;

      // best-first bottleneck-weight enumeration
      const std::string src_kmer(ref_seq, k);
      const std::string sink_kmer(ref_seq + ref_len - k, k);
      std::vector<uint8_t> is_sink(g.label.size(), 0);
      is_sink[g.sink] = 1;
      std::vector<int> alts;
      g.alt_nodes(sink_kmer, false, true, &alts);
      for (int id : alts) is_sink[id] = 1;

      std::priority_queue<HeapEnt, std::vector<HeapEnt>, HeapCmp> heap;
      long long counter = 0;
      const int BIG = 1000000;
      heap.push({BIG, counter++, g.source, g.label[g.source]});
      alts.clear();
      g.alt_nodes(src_kmer, true, false, &alts);
      for (int id : alts) heap.push({BIG, counter++, id, g.label[id]});

      int found = 0;
      while (!heap.empty() && found < max_paths) {
        HeapEnt e = heap.top();
        heap.pop();
        if (is_sink[e.node]) {
          if ((int64_t)e.prefix.size() > seq_stride) {
            rc[s] = 1;
            break;
          }
          const int64_t base = ((int64_t)s * max_paths + found);
          std::memcpy(seq_pool + base * seq_stride, e.prefix.data(),
                      e.prefix.size());
          seq_len[base] = (int32_t)e.prefix.size();
          weight[base] = e.minw;
          ++found;
        }
        const auto& to = g.out_to[e.node];
        const auto& w = g.out_w[e.node];
        for (size_t i = 0; i < to.size(); ++i) {
          if (w[i] < min_path_weight) continue;
          heap.push({std::min(e.minw, w[i]), counter++, to[i],
                     e.prefix + g.label[to[i]].back()});
        }
      }
      n_paths[s] = found;
      break;
    }
  }
  return 0;
}

}  // extern "C"
