"""Projection operators: struct flattening, column prefixing.

Parity targets (reference file:line):
- P5 recursive struct flattening: clean.py:161-179 (flatten_stuct_schema)
- P4 rename/prefix for dimension joins: enrich.py:50-52

Both are pure schema-walks producing ``Column`` expressions — zero
execution cost beyond the projection itself; Catalyst prunes unreferenced
leaves at the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def flatten_struct_columns(
    schema: StructType,
    prefix: str = "",
    only: set[str] | None = None,
    separator: str = "_",
) -> list[Column]:
    """Walk a schema, emitting one aliased Column per leaf field.

    Struct fields are expanded recursively into ``parent_child`` columns
    (lowercased, dots → separator); non-struct fields pass through. When
    ``only`` is given, just those top-level structs are expanded and
    every other column is kept as-is — matching the reference's behavior
    of flattening only `attributes` / `hours` (clean.py:64,108).
    """
    columns: list[Column] = []
    for field in schema.fields:
        path = f"{prefix}.{field.name}" if prefix else field.name
        expand = isinstance(field.dataType, StructType) and (
            prefix or only is None or field.name in only
        )
        if expand:
            columns.extend(
                flatten_struct_columns(field.dataType, path, only, separator)
            )
        else:
            alias = path.replace(".", separator).lower()
            columns.append(F.col(f"`{path}`" if "." not in path else path).alias(alias))
    return columns


def flatten_structs(
    df: DataFrame, only: set[str] | None = None, separator: str = "_"
) -> DataFrame:
    """Flatten (selected) struct columns into top-level leaf columns."""
    return df.select(flatten_struct_columns(df.schema, "", only, separator))


def prefix_columns(
    df: DataFrame, prefix: str, exclude: set[str] | None = None, separator: str = "_"
) -> DataFrame:
    """Rename every column to ``{prefix}{separator}{name}`` (reference
    enrich.py:50-52), optionally excluding e.g. the join key."""
    exclude = exclude or set()
    return df.select(
        *[
            F.col(c).alias(c if c in exclude else f"{prefix}{separator}{c}")
            for c in df.columns
        ]
    )
