"""Batched numerical kernels: SVD, prox operators, reduction (D) applies."""
