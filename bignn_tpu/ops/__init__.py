"""Sparse compute ops (SURVEY.md T2; kernel classes from BASELINE.json:5).

Each op has a stable functional signature with two interchangeable
implementations:

  * ``xla``    — composed from XLA primitives (take / segment_sum with sorted
                 hints / dot_general). Always available, runs on CPU and TPU.
  * ``pallas`` — hand-written Pallas TPU kernels (ops/pallas/) for the hot
                 paths: sorted segment reduction via MXU one-hot matmul,
                 fused gather+scale+segment-sum SpMM, SDDMM + segment softmax.

``set_backend`` / ``backend`` control dispatch globally;
per-call ``backend=...`` overrides.

Mapping to the reference's native dependency ops (SURVEY.md §2.2):
  N1 torch_scatter.scatter_*   -> segment_sum / segment_mean / segment_max
  N2 torch_sparse.spmm         -> spmm_sorted_coo
  N3 GAT scatter-softmax       -> sddmm + segment_softmax
  N4 ATen index_select         -> gather_rows
  N5 cuDNN GEMM                -> plain jnp dot (no custom op needed)
"""

from bignn_tpu.ops.dispatch import set_backend, get_backend, backend_scope
from bignn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
)
from bignn_tpu.ops.spmm import spmm_sorted_coo, block_diag_spmm, block_adjacency
from bignn_tpu.ops.multihead import spmm_multihead
from bignn_tpu.ops.sddmm import sddmm
from bignn_tpu.ops.gather import gather_rows

__all__ = [
    "set_backend",
    "get_backend",
    "backend_scope",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "spmm_sorted_coo",
    "block_diag_spmm",
    "block_adjacency",
    "spmm_multihead",
    "sddmm",
    "gather_rows",
]
