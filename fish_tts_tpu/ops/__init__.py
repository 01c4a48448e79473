"""Compute ops.

XLA building blocks (attention, norms, rope, causal convs) plus the Pallas
TPU kernels that carry single-stream decode: ``fast_decoder`` (fused
codebook loop, VMEM-resident int8 weights) and ``slow_stack``
(weight-streaming 28-layer step with the fused LM head).
"""
