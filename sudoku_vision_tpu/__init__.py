"""tpu-sudoku-vision: a TPU-native camera-to-solution sudoku framework.

Re-implements the capabilities of the HueCodes/sudoku-vision reference as an
idiomatic JAX/XLA/Pallas stack: the whole perception path (preprocess → grid
detect → warp → 81-cell extract → CNN classify) is one jitted graph over
batched frames; constraint reasoning and the C++ backtracking solver run on
the host, consuming one 81-logit tensor per frame.

Subpackages:
  ops        OpenCV-parity image kernels (lax + Pallas)
  cv         grid detection, quality gating, temporal stabilizer
  models     flax digit classifiers (v1 CNN, v3 residual+SE)
  ml         datasets, synthetic generation, training, evaluation, export
  reasoning  sudoku-rule validation, beam-search + constraint correction
  pipeline   end-to-end run()/run_v2() APIs, overlay, benchmark
  parallel   mesh/sharding helpers for multi-chip throughput
  solver     ctypes binding to the native C++ solver
"""

__version__ = "0.1.0"
