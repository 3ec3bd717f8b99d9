"""Utilities: layout conversion, stream simulation, test images."""
