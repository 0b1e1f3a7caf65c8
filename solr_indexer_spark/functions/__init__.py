"""Scalar function library: reference-parity string/date/spatial
transforms as pure Spark column expressions (SURVEY §2.6)."""
