"""Pallas TPU kernels for hot ops.

Import the kernel modules directly (they pull in jax.experimental.pallas):

    from hyperslam_tpu.ops.schur import schur_reduce
"""
