"""Type-system bridges: Athena/Glue DDL ↔ Spark types + name sanitization.

Mirrors the conversion matrix of the reference
(/root/reference/awswrangler/_data_types.py:24 ``athena2pyarrow``,
:151 ``pyarrow2athena``, :363 ``athena_types_from_pandas``) but
between Athena DDL strings and Spark SQL types — the two type systems
a Spark+Glue deployment actually bridges.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from aws_data_wrangler_spark.exceptions import UnsupportedType

_ATHENA2SPARK_SIMPLE: Dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$")
_CHAR_RE = re.compile(r"^(?:var)?char\s*\(\s*\d+\s*\)$")
_ARRAY_RE = re.compile(r"^array\s*<(.+)>$")
_MAP_RE = re.compile(r"^map\s*<(.+)>$")
_STRUCT_RE = re.compile(r"^struct\s*<(.+)>$")


def _split_top_level(body: str) -> List[str]:
    """Split ``a,b<c,d>,e`` on commas not nested inside <> or ()
    (decimal(p,s) carries a comma inside parens)."""
    parts: List[str] = []
    depth = 0
    current = []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(current))
            current = []
        else:
            current.append(ch)
    if current:
        parts.append("".join(current))
    return parts


def athena2spark(dtype: str) -> T.DataType:
    """Athena/Glue DDL type string → Spark DataType.

    Ref behavior: /root/reference/awswrangler/_data_types.py:24.
    """
    dtype = dtype.strip().lower()
    if dtype in _ATHENA2SPARK_SIMPLE:
        return _ATHENA2SPARK_SIMPLE[dtype]
    m = _DECIMAL_RE.match(dtype)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if _CHAR_RE.match(dtype):
        return T.StringType()
    m = _ARRAY_RE.match(dtype)
    if m:
        return T.ArrayType(athena2spark(m.group(1)))
    m = _MAP_RE.match(dtype)
    if m:
        key_s, value_s = _split_top_level(m.group(1))
        return T.MapType(athena2spark(key_s), athena2spark(value_s))
    m = _STRUCT_RE.match(dtype)
    if m:
        fields = []
        for part in _split_top_level(m.group(1)):
            name, _, sub = part.partition(":")
            fields.append(T.StructField(name.strip(), athena2spark(sub)))
        return T.StructType(fields)
    raise UnsupportedType(f"Unsupported Athena type: {dtype}")


def spark2athena(dtype: T.DataType) -> str:
    """Spark DataType → Athena/Glue DDL type string.

    Ref behavior: /root/reference/awswrangler/_data_types.py:151.
    """
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.ByteType):
        return "tinyint"
    if isinstance(dtype, T.ShortType):
        return "smallint"
    if isinstance(dtype, T.IntegerType):
        return "int"
    if isinstance(dtype, T.LongType):
        return "bigint"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dtype, T.ArrayType):
        return f"array<{spark2athena(dtype.elementType)}>"
    if isinstance(dtype, T.MapType):
        return f"map<{spark2athena(dtype.keyType)},{spark2athena(dtype.valueType)}>"
    if isinstance(dtype, T.StructType):
        inner = ",".join(f"{f.name}:{spark2athena(f.dataType)}" for f in dtype.fields)
        return f"struct<{inner}>"
    raise UnsupportedType(f"Unsupported Spark type: {dtype}")


def athena_types_from_spark(
    df: DataFrame, partition_cols: Optional[List[str]] = None
) -> Tuple[Dict[str, str], Dict[str, str]]:
    """(columns_types, partitions_types) for a DataFrame.

    Ref behavior: /root/reference/awswrangler/_data_types.py:393
    ``athena_types_from_pandas_partitioned``.
    """
    partition_cols = partition_cols or []
    columns: Dict[str, str] = {}
    partitions: Dict[str, str] = {}
    for field in df.schema.fields:
        target = partitions if field.name in partition_cols else columns
        target[field.name] = spark2athena(field.dataType)
    return columns, partitions


_SANITIZE_RE = re.compile(r"[^a-z0-9_]+")


def sanitize_name(name: str) -> str:
    """Glue-compatible identifier: lowercase, [a-z0-9_] only.

    Ref behavior: /root/reference/awswrangler/catalog/_utils.py
    ``sanitize_column_name`` / ``sanitize_table_name``.
    """
    name = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", name.strip())
    return _SANITIZE_RE.sub("_", name.lower()).strip("_") or "_"


def athena2quicksight(dtype: str) -> str:
    """Athena DDL type → QuickSight logical type
    (ref: /root/reference/awswrangler/_data_types.py:121)."""
    dtype = dtype.lower()
    if dtype in ("tinyint", "smallint", "int", "integer", "bigint"):
        return "INTEGER"
    if dtype in ("float", "real", "double") or dtype.startswith("decimal"):
        return "DECIMAL"
    if dtype in ("boolean", "bool"):
        return "BOOLEAN"
    if dtype in ("string", "char", "varchar") or dtype.startswith(("char", "varchar")):
        return "STRING"
    if dtype in ("timestamp", "date"):
        return "DATETIME"
    if dtype == "binary":
        return "BIT"
    raise ValueError(f"unsupported quicksight type: {dtype}")
