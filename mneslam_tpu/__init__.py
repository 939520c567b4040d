"""MNESLAM-TPU: a TPU-native multi-agent neural SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MNE-SLAM
(dtc111111/MNESLAM, CVPR 2025): per-agent dense RGB-D SLAM combining a
learned recurrent tracker with dense bundle adjustment, a tri-plane neural
implicit map trained online by volume rendering, and multi-agent
collaboration (place recognition, inter-agent loop closure, map fusion) —
redesigned for TPU hardware: static shapes, jitted super-steps, Pallas
kernels for the hot ops, and device-mesh sharding for scale.
"""

__version__ = "0.1.0"
