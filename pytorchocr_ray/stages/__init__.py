"""Ray Data stage functions / actor classes for the extraction pipeline."""
