"""Pallas TPU kernels for the sparse hot paths (SURVEY.md T2).

Kernels:
  * segment.py — sorted segment-sum / segment-softmax via block-local one-hot
    matmul on the MXU (replaces torch_scatter, SURVEY.md §2.2 N1/N3).
  * spmm.py    — fused gather + scale + sorted-segment-sum SpMM
    (replaces torch_sparse.spmm, SURVEY.md §2.2 N2).
  * sddmm.py   — per-edge dense-dense dots (GAT scoring, SURVEY.md §2.2 N3).

Every kernel has an interpret-mode path for CPU CI (SURVEY.md §4 item 1) and a
parity test against the XLA composition in tests/test_pallas_kernels.py.
"""
