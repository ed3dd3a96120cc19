"""Single-process golden reference implementation (no Ray)."""
