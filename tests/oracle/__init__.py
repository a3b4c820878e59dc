"""Pure-Python single-node oracle: ground truth for rank-identity tests."""
