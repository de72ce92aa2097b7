"""Scalar/expression helpers: calendar decomposition, portable hashing,
text metrics. All column-in/column-out — stays inside codegen."""
