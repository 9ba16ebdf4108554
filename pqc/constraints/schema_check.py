"""expect_schema — schema validation as a first-class constraint.

The reference ingests everything as untyped strings (`app.py:911`,
dtype=str) and sanitizes after the fact (`make_arrow_safe`,
`app.py:144-225`); the engine inverts that weakness: the declared
StructType is itself a constraint checked before any row-level work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

EXPECTED_IMAGE_FIELDS: dict[str, T.DataType] = {
    "image_id": T.StringType(),
    "bytes": T.BinaryType(),
    "w": T.IntegerType(),
    "h": T.IntegerType(),
    "fmt": T.StringType(),
    "caption": T.StringType(),
    "phash": T.LongType(),
}


def expect_schema(
    df: DataFrame, expected: dict[str, T.DataType] | None = None
) -> list[str]:
    """Return a list of human-readable schema mismatches (empty = pass).

    Checked structurally (names + types), not positionally; extra
    columns (seq, part) are allowed — partition/lineage columns are
    layout, not schema.
    """
    expected = expected or EXPECTED_IMAGE_FIELDS
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for name, dtype in expected.items():
        if name not in actual:
            problems.append(f"missing column {name!r} ({dtype.simpleString()})")
        elif actual[name] != dtype:
            problems.append(
                f"column {name!r}: expected {dtype.simpleString()}, "
                f"got {actual[name].simpleString()}"
            )
    return problems
