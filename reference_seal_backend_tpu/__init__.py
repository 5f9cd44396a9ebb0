"""reference_seal_backend_tpu — a TPU-native homomorphic-encryption framework.

A from-scratch rebuild of the capabilities of the HEBench SEAL CPU reference
backend (``hebench/reference-seal-backend``) as an idiomatic JAX/XLA/Pallas
framework for TPUs:

* BFV (exact integer) and CKKS (approximate real) RLWE schemes over RNS
  limb-major ``uint32`` arrays resident in HBM,
* every SEAL evaluator primitive (add / multiply / relinearize / rescale /
  mod-switch / Galois rotation / key-switch) as jitted XLA graphs and Pallas
  kernels, batch and limb axes shardable over a ``jax.sharding.Mesh``,
* the 7-step HEBench pipeline (encode / encrypt / load / operate / store /
  decrypt / decode) and all benchmark workloads of the reference
  (element-wise add/mul, dot product, three matrix-multiply packings,
  logistic-regression inference).

This is not a port: there is no SEAL code here.  The reference
(/root/reference) defines *what* to build (see SURVEY.md); the architecture
is TPU-first: residues live in Montgomery form so a modular multiply is one
Montgomery product built from 16-bit half-word products, NTTs are either
vectorized stage-reshape butterflies or 4-step MXU matmuls, and OpenMP batch
loops of the reference become vmapped / pjit-sharded batch dimensions.
"""

__version__ = "0.1.0"
