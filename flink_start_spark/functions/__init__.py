"""Scalar/array function library (all JVM-side Catalyst expressions)."""
