"""SIGE neural-net layer (flax.linen modules + planning)."""
