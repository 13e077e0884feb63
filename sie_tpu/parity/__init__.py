"""End-to-end convergence-parity harness vs a reference-faithful torch IGN."""
