"""Arrow-vectorized scalar functions (the engine's only Python data path)."""
