"""Large-scale training-data operators over generic Arrow tables.

Everything here follows the same scale discipline as the extraction
pipeline: column-pruned reads, vectorized per-batch kernels, partial
aggregation before any groupby shuffle, broadcast for small sides.
"""


def read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pool_size(cap: int = 8) -> int:
    """Actor-pool size that always leaves CPUs for the read/shuffle stages —
    a pool reserving every CPU starves upstream tasks and stalls the
    streaming executor."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min(cap, cpus - 2))
