"""Deterministic synthetic interleaved corpus (documents + media + GT)."""
