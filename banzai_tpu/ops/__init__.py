"""Device (JAX/XLA/Pallas) implementations of the per-block pipeline stages.

Every op takes statically-shaped padded arrays plus true lengths, is
jit/vmap-compatible, and has a NumPy differential oracle elsewhere in the
package (SURVEY.md §7 design stance).
"""
