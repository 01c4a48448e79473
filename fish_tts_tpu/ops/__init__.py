"""Compute ops: attention, norms, rope, causal convs, pallas kernels."""
