"""Text-span normalization map (boilerplate strip + cn2en + whitespace).

Semantics modeled on the reference's text cleanup rules:
  * full-width -> ASCII punctuation (the ``cn2en`` map,
    reference pytocr/data/imaug/label_ops.py:131-133:
    （）：；！？ -> ():;!?),
  * whitespace normalization (the reference strips spaces from rec labels,
    tools/data/gen_json_label.py:124; here we collapse runs + trim, the
    boilerplate-strip/normalization map required by the target contract),
  * boilerplate removal: any ``⟪...⟫``-delimited marker block is dropped
    (synthetic corpora embed ads/nav chrome between those markers).

Exposed in two equivalent forms:
  * :func:`normalize_text` — scalar python (oracle / unit tests),
  * :func:`normalize_column` — vectorized pyarrow compute over a string
    ChunkedArray (pipeline hot path; zero python-per-row),
and :data:`NORMALIZE_SQL` — the same map as a DuckDB SQL expression template
used by the driver-facing oracle.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

CN2EN = {
    "（": "(",
    "）": ")",
    "：": ":",
    "；": ";",
    "！": "!",
    "？": "?",
}

_BOILERPLATE_RE = re.compile(r"⟪[^⟫]*⟫")
_WS_RE = re.compile(r"\s+")
_CN2EN_TRANS = str.maketrans(CN2EN)


def normalize_text(text: str) -> str:
    """Scalar normalization — the oracle-side twin of :func:`normalize_column`."""
    t = _BOILERPLATE_RE.sub("", text)
    t = t.translate(_CN2EN_TRANS)
    t = _WS_RE.sub(" ", t)
    return t.strip()


def normalize_column(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Vectorized normalization over an Arrow string column (RE2 kernels)."""
    out = pc.replace_substring_regex(col, pattern="⟪[^⟫]*⟫", replacement="")
    for src, dst in CN2EN.items():
        out = pc.replace_substring(out, pattern=src, replacement=dst)
    out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


# DuckDB expression computing the identical normalization for the SQL oracle.
# {col} is substituted with the source column name.
NORMALIZE_SQL = (
    "trim(regexp_replace("
    "translate(regexp_replace({col}, '⟪[^⟫]*⟫', '', 'g'),"
    " '（）：；！？', '():;!?'),"
    " '\\s+', ' ', 'g'))"
)
