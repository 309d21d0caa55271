"""Operators: windowing (reference parity) + training-data extensions."""
