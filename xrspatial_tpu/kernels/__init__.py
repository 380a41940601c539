"""Compute kernels: fused XLA programs and Pallas TPU kernels.

Layer L4 of the TPU-native design (SURVEY.md §7): everything the reference
implemented as Numba ``@ngjit`` CPU loops or ``@cuda.jit`` kernels lives here
as either (a) fused jnp/lax programs that XLA compiles into single
VMEM-tiled loops, or (b) hand-written Pallas kernels for the hot paths.
"""
