// Native host-side graph builder (SURVEY.md T1 fast path).
//
// The reference leans on native code for its hot loops via torch-scatter /
// torch-sparse (SURVEY.md §2.2); its *host-side* preprocessing (networkx ->
// PyG tensors) is Python and slow. Here the device-side kernels are Pallas
// (ops/pallas/), and this C++ library covers the host-side runtime work that
// sits in the training path at scale:
//
//   * destination-sorted edge construction with self-loops + symmetric GCN
//     normalization in one pass (counting sort, O(E + N) — numpy argsort is
//     O(E log E) and 3 passes);
//   * degree computation;
//   * hash-based edge partitioning for the multi-host outer graph (P2).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

extern "C" {

// Sort edges by destination (stable), optionally append self-loops, and
// compute symmetric GCN weights 1/sqrt(deg_in(src) * deg_in(dst)) where
// degrees count self-loops. Outputs must be sized n_out = n_edges +
// (add_self_loops ? n_nodes : 0). Returns n_out, or -1 on bad input.
int64_t build_sorted_graph(
    int64_t n_nodes,
    int64_t n_edges,
    const int32_t* src,
    const int32_t* dst,
    int32_t add_self_loops,
    int32_t normalize,
    int32_t* out_src,
    int32_t* out_dst,
    float* out_w) {
  if (n_nodes < 0 || n_edges < 0) return -1;
  const int64_t n_out = n_edges + (add_self_loops ? n_nodes : 0);

  // in-degree (counting pass, includes self-loops)
  std::vector<int64_t> count(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    const int32_t d = dst[e];
    if (d < 0 || d >= n_nodes || src[e] < 0 || src[e] >= n_nodes) return -1;
    ++count[d];
  }
  if (add_self_loops) {
    for (int64_t v = 0; v < n_nodes; ++v) ++count[v];
  }

  // inverse sqrt degree for normalization
  std::vector<float> inv_sqrt;
  if (normalize) {
    inv_sqrt.resize(static_cast<size_t>(n_nodes));
    for (int64_t v = 0; v < n_nodes; ++v) {
      const int64_t deg = count[v];
      inv_sqrt[v] = deg > 0 ? 1.0f / std::sqrt(static_cast<float>(deg)) : 0.0f;
    }
  }

  // prefix sums -> write offsets per destination row
  std::vector<int64_t> offset(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t v = 0; v < n_nodes; ++v) offset[v + 1] = offset[v] + count[v];

  // scatter edges into sorted position (stable within a row: original edges
  // first in input order, then the self-loop)
  std::vector<int64_t> cursor(offset.begin(), offset.end() - 1);
  for (int64_t e = 0; e < n_edges; ++e) {
    const int32_t s = src[e], d = dst[e];
    const int64_t pos = cursor[d]++;
    out_src[pos] = s;
    out_dst[pos] = d;
    out_w[pos] = normalize ? inv_sqrt[s] * inv_sqrt[d] : 1.0f;
  }
  if (add_self_loops) {
    for (int64_t v = 0; v < n_nodes; ++v) {
      const int64_t pos = cursor[v]++;
      out_src[pos] = static_cast<int32_t>(v);
      out_dst[pos] = static_cast<int32_t>(v);
      out_w[pos] = normalize ? inv_sqrt[v] * inv_sqrt[v] : 1.0f;
    }
  }
  return n_out;
}

// In-degree of each node (self-loops not added).
void in_degrees(
    int64_t n_nodes,
    int64_t n_edges,
    const int32_t* dst,
    int32_t* out_deg) {
  std::memset(out_deg, 0, sizeof(int32_t) * static_cast<size_t>(n_nodes));
  for (int64_t e = 0; e < n_edges; ++e) {
    const int32_t d = dst[e];
    if (d >= 0 && d < n_nodes) ++out_deg[d];
  }
}

// Assign each undirected edge (u, v) to one of n_parts shards by the hash of
// its smaller endpoint (keeps both directions of an edge together and gives
// every shard a contiguous-by-construction dst range after local sorting).
// out_part[e] in [0, n_parts).
void partition_edges_hash(
    int64_t n_edges,
    const int32_t* src,
    const int32_t* dst,
    int32_t n_parts,
    int32_t* out_part) {
  for (int64_t e = 0; e < n_edges; ++e) {
    uint32_t key = static_cast<uint32_t>(src[e] < dst[e] ? src[e] : dst[e]);
    // splittable 32-bit mix (Murmur3 finalizer)
    key ^= key >> 16; key *= 0x85ebca6bu;
    key ^= key >> 13; key *= 0xc2b2ae35u;
    key ^= key >> 16;
    out_part[e] = static_cast<int32_t>(key % static_cast<uint32_t>(n_parts));
  }
}

// Greedy first-fit packing of items (sizes[i] rows, each <= block_rows)
// into fixed block_rows-row blocks in slot order, never straddling a block
// boundary. Writes off[i] = packed row offset of item i; returns the packed
// extent in rows (a multiple of the last partial block's end, not rounded).
// Used by the hierarchical sampler's block-local molecule layout — the
// per-step hot path where a Python loop over ~16K molecules is too slow.
int64_t greedy_pack_blocks(
    int64_t n,
    const int32_t* sizes,
    int32_t block_rows,
    int32_t* off) {
  int64_t pos = 0;
  const int64_t b = block_rows;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t s = sizes[i];
    if (s > b || s < 0) return -1;
    if (pos % b + s > b) pos = (pos / b + 1) * b;
    off[i] = static_cast<int32_t>(pos);
    pos += s;
  }
  return pos;
}

}  // extern "C"
