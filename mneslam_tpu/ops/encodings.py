"""Coordinate encodings (pure JAX) — the tinycudann replacement.

The reference builds its positional encodings through the tinycudann CUDA
extension (`/root/reference/model/encodings.py`); the runtime configuration
uses only OneBlob(n_bins=16) over normalized coordinates. Here every
encoding is a closed-form jnp expression that XLA fuses straight into the
decoder matmuls — no kernel needed at these sizes.

Implemented: OneBlob (quartic kernel, matching tinycudann's definition),
Frequency (NeRF sin/cos), SphericalHarmonics (degree <= 4), Identity.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def one_blob_encode(x: jax.Array, n_bins: int = 16) -> jax.Array:
    """OneBlob encoding (NRC / tinycudann semantics).

    Each input coordinate in [0, 1] is encoded by evaluating a quartic
    kernel (stddev 1/n_bins) against n_bins bin centers.

    x [..., D] -> [..., D * n_bins]
    """
    # Flat-layout formulation: build [..., D*n_bins] directly (the 3D
    # [..., D, n_bins] intermediate forces padded-lane relayouts on TPU).
    D = x.shape[-1]
    centers = (jnp.arange(n_bins, dtype=x.dtype) + 0.5) / n_bins
    centers_flat = jnp.tile(centers, D)                      # [D*n_bins]
    x_rep = jnp.repeat(x, n_bins, axis=-1)                   # [..., D*n_bins]
    t = (x_rep - centers_flat) * n_bins
    # tinycudann's "quartic" kernel: 15/16 (1 - t^2)^2 on |t| < 1, else 0
    return jnp.where(jnp.abs(t) < 1.0, (15.0 / 16.0) * (1.0 - t * t) ** 2, 0.0)


def frequency_encode(x: jax.Array, n_frequencies: int = 12) -> jax.Array:
    """NeRF-style sin/cos frequency encoding.

    x [..., D] -> [..., D * 2 * n_frequencies]
    """
    freqs = (2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)) * jnp.pi
    ang = x[..., None] * freqs  # [..., D, F]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [..., D, 2F]
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_frequencies)


def spherical_harmonics_encode(d: jax.Array, degree: int = 4) -> jax.Array:
    """Real spherical-harmonics basis of unit directions up to `degree`.

    d [..., 3] unit vectors -> [..., degree**2]
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree > 2:
        xy, yz, xz = x * y, y * z, x * z
        xx, yy, zz = x * x, y * y, z * z
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.31539156525252005 * (3.0 * zz - 1.0),
                -1.0925484305920792 * xz,
                0.5462742152960396 * (xx - yy)]
    if degree > 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [-0.5900435899266435 * y * (3 * xx - yy),
                2.890611442640554 * x * y * z,
                -0.4570457994644658 * y * (5 * zz - 1),
                0.3731763325901154 * z * (5 * zz - 3),
                -0.4570457994644658 * x * (5 * zz - 1),
                1.445305721320277 * z * (xx - yy),
                -0.5900435899266435 * x * (xx - 3 * yy)]
    return jnp.stack(out, axis=-1)


def get_encoder(
    encoding: str,
    input_dim: int = 3,
    n_bins: int = 16,
    n_frequencies: int = 12,
    degree: int = 4,
) -> Tuple[Callable[[jax.Array], jax.Array], int]:
    """Factory mirroring the reference's `get_encoder` parameter surface
    (`model/encodings.py:6-97`). Returns (encode_fn, output_dim)."""
    enc = encoding.lower()
    if "blob" in enc:
        return (lambda x: one_blob_encode(x, n_bins)), input_dim * n_bins
    if "freq" in enc:
        return (lambda x: frequency_encode(x, n_frequencies)), input_dim * 2 * n_frequencies
    if "spherical" in enc:
        return (lambda x: spherical_harmonics_encode(x, degree)), degree ** 2
    if "identity" in enc:
        return (lambda x: x), input_dim
    raise ValueError(f"unknown encoding: {encoding}")
