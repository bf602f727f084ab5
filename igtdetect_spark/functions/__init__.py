"""Column-expression functions (native, Catalyst-optimizable)."""
