"""Core math ops: Lie groups, rotations, projective geometry, BA, interpolation."""
