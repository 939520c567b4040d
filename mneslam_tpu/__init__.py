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

# Public API surface (lazy — heavy modules import on first touch)
__all__ = [
    "MNESLAM",
    "build_slam",
    "make_config",
    "load_config",
    "get_dataset",
]


def __getattr__(name):
    if name in ("MNESLAM", "build_slam"):
        from . import slam

        return getattr(slam, name)
    if name in ("make_config", "load_config"):
        from . import config

        return getattr(config, name)
    if name == "get_dataset":
        from .data.datasets import get_dataset

        return get_dataset
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
