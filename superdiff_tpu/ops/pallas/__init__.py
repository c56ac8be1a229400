"""Pallas TPU kernels — the native tier of the framework.

The reference ships no C++/CUDA (SURVEY.md §0); its native performance comes
from library wheels. Here the equivalent tier is hand-written Pallas kernels
for the bandwidth-bound sampler epilogue (kappa + mixing + EM update + Itô
accumulation fused into one HBM pass).
"""
