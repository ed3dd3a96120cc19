"""Deterministic model-weight artifacts + broadcast helpers."""
