"""Pure / vectorized kernels shared by operators, oracles, and UDFs."""
