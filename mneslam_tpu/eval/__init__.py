"""Evaluation tooling: trajectory (ATE/APE) and reconstruction metrics."""
