"""Explicit Arrow schemas for every logical table (SURVEY.md §1.2).

The reference's schema is implicit (whatever dict keys KeepKeys selects,
pytocr/data/imaug/operators.py:115-124); here every table is declared.
"""

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),  # "text" | "media"
        ("text", pa.string()),  # raw text for kind="text"; "" for media
        ("media_ref", pa.string()),  # "" for text; key into media table
        ("offset", pa.int32()),  # position of the span within the document
    ]
)

DOCUMENTS = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

MEDIA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("data", pa.binary()),  # PNG-encoded grayscale payload
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

REGION_STRUCT = pa.struct(
    [
        ("box", pa.list_(pa.int16())),  # 8 values x1,y1,...,x4,y4 clockwise from tl
        ("text", pa.string()),
    ]
)

MEDIA_GT = pa.schema(
    [("media_ref", pa.string()), ("regions", pa.list_(REGION_STRUCT))]
)

OUT_SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),  # normalized text / recognized region text
        ("media_ref", pa.string()),
        ("order", pa.int32()),  # 0-based position in the reassembled sequence
    ]
)

EXTRACTED = pa.schema(
    [("doc_id", pa.string()), ("spans", pa.list_(OUT_SPAN_STRUCT))]
)

# Flat variant of EXTRACTED used for SQL-friendly comparisons / sinks.
EXTRACTED_FLAT = pa.schema(
    [
        ("doc_id", pa.string()),
        ("order", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
    ]
)
