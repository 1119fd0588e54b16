"""TPU-native statistical motion synthesis (morphablegraphs rebuild).

A JAX/XLA/Pallas re-design of dfki-asr/morphablegraphs: statistical motion
modelling and synthesis via functional PCA + Gaussian Mixture Models (Min &
Chai, "Motion Graphs++"). Motion primitives are pytrees of fPCA eigenbases,
GMM parameters and B-spline knots; the graph-walk inner loop runs fully
jitted, and crowds of characters synthesize concurrently under vmap/pjit.

Layer map (mirrors SURVEY.md §7):
  ops/         numeric kernels: quaternions, B-splines, GMM, FK, time warping
  models/      motion-primitive / state-graph pytrees, skeleton, BVH + JSON IO
  constraints/ constraint compilation + vectorized evaluation
  synthesis/   step function, planner, optimizers, post-processing
  construct/   offline training: DTW, fPCA, GMM-EM, cluster trees
  parallel/    device-mesh sharding for crowd synthesis
  serve/       CLI / REST service layer
"""

__version__ = "0.1.0"

B_SPLINE_DEGREE = 3
