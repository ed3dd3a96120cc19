"""Sampling / shuffle / split wrappers (SURVEY.md §2.9).

Maps the reference's seeded sampling utilities to Ray Data natives:
  * ``ratio_list`` per-source subsampling (simple_dataset.py:45-57)
    -> :func:`sample_ratio` (``ds.random_sample`` with a fixed seed),
  * epoch shuffle (simple_dataset.py:59-62) -> :func:`seeded_shuffle`,
  * train/val split (tools/data/gen_json_label.py:93-106)
    -> :func:`train_val_split` (``ds.split_proportionately``).
"""

from __future__ import annotations


def sample_ratio(ds, ratio: float, seed: int = 2022):
    """Seeded Bernoulli subsample — the streaming analog of the reference's
    ``random.sample(lines, round(n*ratio))`` (exact-count sampling would
    need a global pass; at scale the Bernoulli form is the right trade)."""
    return ds.random_sample(ratio, seed=seed)


def seeded_shuffle(ds, seed: int = 2022):
    """Full random shuffle (an all-to-all exchange — use only when order
    randomization is genuinely required, e.g. training epochs)."""
    return ds.random_shuffle(seed=seed)


def train_val_split(ds, val_ratio: float = 0.1, seed: int = 2022):
    """Seeded shuffle + proportional split -> (train_ds, val_ds)."""
    shuffled = ds.random_shuffle(seed=seed)
    train, val = shuffled.split_proportionately([1.0 - val_ratio])
    return train, val
