"""Pure computational kernels (no Ray imports).

Every function here is deterministic and side-effect free; the Ray pipeline
stages and the single-process oracle both call these exact functions, so
pipeline-vs-oracle parity on the math is by construction — the distributed
tests then only have to verify composition (ordering, grouping, resume).
"""
