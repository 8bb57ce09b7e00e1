"""Pallas TPU kernels for the hot paths.

The classical checkerboard Metropolis kernel keeps the whole spin field in
VMEM across many sweeps, generating randomness with the on-chip PRNG, so HBM
traffic drops from O(sweeps) array round-trips to a single load + store.
"""

from isingmontecarlo_tpu.ops.checkerboard import checkerboard_multi_sweep

__all__ = ["checkerboard_multi_sweep"]
