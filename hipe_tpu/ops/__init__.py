"""Compute ops: integer-exact image filters (XLA + Pallas TPU paths)."""
