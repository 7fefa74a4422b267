"""hyperslam_tpu — TPU-native continuous-time SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
VIS4ROB-lab/HyperSLAM (continuous-time stereo-inertial odometry on a
cumulative SE3 B-spline with sliding-window NLLS), designed TPU-first:
batched factor linearization, Schur-complement landmark elimination on the
MXU, fixed-shape masked windows, and sharded multi-chip bundle adjustment.
"""

__version__ = "0.1.0"
