"""Dynamic field mappings: auto-detection of reference field types.

Rebuilds the reference's MappingsManager auto-mapping semantics
(MappingsManager.ts:314-367 recursive walk, :376-445 detectFieldType,
:454-505 detectKeywordOrText): walk a document (or a Spark schema + sampled
values), detect each field's type, and produce the ``IndexConfig.fields``
dict + the analyzer routing (SearchEngine.ts:939-954).

On Spark, structural typing comes FREE from the DataFrame schema (numbers,
booleans, dates, arrays, structs carry their type); only string columns need
value sniffing — done on a bounded sample, aggregated by majority, so
inference is one small job regardless of corpus size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: analyzer routing per detected type (SearchEngine.ts:939-954)
TYPE_ANALYZER = {
    "text": "standard", "keyword": "standard",
    "email": "email", "url": "url", "phone": "phone",
}

#: types that are tokenized into the inverted index (SearchEngine.ts:892)
INDEXED_TYPES = ("text", "keyword", "email", "url", "phone")

#: the full field-type whitelist (valueObjects/FieldType.ts:23-40) — the
#: reference's FieldType value object rejects anything else at construction
VALID_FIELD_TYPES = frozenset({
    "text", "keyword", "number", "integer", "float", "double", "long",
    "short", "byte", "boolean", "date", "geo_point", "email", "url",
    "phone", "object",
})


def validate_fields(fields: dict) -> None:
    """Reject unknown field types in an explicit mapping — the reference
    validates user-supplied mappings against its type whitelist
    (FieldType.ts:44-52, MappingsManager.ts:164-200); a typo'd type must
    fail loudly instead of silently routing to the standard analyzer."""
    if not isinstance(fields, dict):
        raise TypeError(f"fields must be a dict, got {type(fields).__name__}")
    for name, ftype in fields.items():
        if not name or not isinstance(name, str):
            raise ValueError(f"invalid field name: {name!r}")
        if ftype not in VALID_FIELD_TYPES:
            raise ValueError(
                f"invalid field type {ftype!r} for field {name!r}; "
                f"must be one of: {', '.join(sorted(VALID_FIELD_TYPES))}")

_EMAIL = re.compile(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}$")
_URL = re.compile(r"^https?://.+")
_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DATETIME = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}")
_TEXT_NAME_PATTERNS = [
    "name", "title", "description", "content", "text", "summary",
    "city", "country", "address", "street", "location",
    "comment", "note", "message", "subject", "body",
    "caption", "label", "tag", "category",
]


def _is_number(value: str) -> bool:
    """JS ``!isNaN(Number(value)) && value.trim() !== ''``."""
    s = value.strip()
    if s == "":
        return False
    try:
        float(s)
        return True
    except ValueError:
        # JS Number() also accepts 0x/0b/0o and Infinity
        return bool(re.fullmatch(r"[+-]?(Infinity|0[xXbBoO][0-9a-fA-F]+)", s))


def detect_keyword_or_text(value: str, field_name: str | None = None) -> str:
    """String subtype detection (MappingsManager.ts:454-505, exact order)."""
    if _EMAIL.match(value):
        return "email"
    if _URL.match(value):
        return "url"
    if _DATE.match(value) or _DATETIME.match(value):
        return "date"
    if _is_number(value):
        return "number"
    if field_name:
        low = field_name.lower()
        for pat in _TEXT_NAME_PATTERNS:
            if pat in low:
                return "text"
    if len(value) > 100:
        return "text"
    if " " in value and len(value.strip().split()) > 1:
        return "text"
    return "keyword"


def detect_field_type(value, field_name: str | None = None) -> str | None:
    """Value-driven detection (MappingsManager.ts:376-445, exact order)."""
    if value is None:
        return None
    if isinstance(value, str):
        return detect_keyword_or_text(value, field_name)
    if isinstance(value, bool):  # bool before number: Python bool is int
        return "boolean"
    if isinstance(value, (int, float)):
        return "number"
    import datetime
    if isinstance(value, (datetime.date, datetime.datetime)):
        return "date"
    if isinstance(value, (list, tuple)):
        if not value:
            return None
        if len(value) == 2 and all(
                isinstance(n, (int, float)) and not isinstance(n, bool)
                for n in value):
            return "geo_point"
        if isinstance(value[0], dict):
            return "object"
        if isinstance(value[0], (str, int, float, bool)):
            return detect_field_type(value[0])
        return None
    if isinstance(value, dict):
        if not value:
            return None
        if "lat" in value and "lon" in value:
            return "geo_point"
        return "object"
    return None


def auto_map(document: dict, mappings: dict | None = None,
             prefix: str = "") -> dict:
    """Recursive document walk (MappingsManager.ts:314-367): first-seen type
    wins; nested objects get dot-path fields; top-level ``id`` is skipped."""
    mappings = {} if mappings is None else mappings
    for key, value in document.items():
        if key == "id" and prefix == "":
            continue
        field = f"{prefix}.{key}" if prefix else key
        t = detect_field_type(value, field)
        if t is None:
            continue
        if isinstance(value, (list, tuple)):
            if not value:
                continue
            if isinstance(value[0], dict):
                mappings.setdefault(field, "object")
                for item in value:
                    auto_map(item, mappings, field)
                continue
            if len(value) == 2 and all(
                    isinstance(n, (int, float)) and not isinstance(n, bool)
                    for n in value):
                mappings.setdefault(field, "geo_point")
                continue
            elem_t = detect_field_type(value[0], field)
            if elem_t:
                mappings.setdefault(field, elem_t)
            continue
        if isinstance(value, dict):
            if "lat" in value and "lon" in value:
                mappings.setdefault(field, "geo_point")
                continue
            auto_map(value, mappings, field)
            continue
        mappings.setdefault(field, t)
    return mappings


def infer_mappings(df: DataFrame, sample_rows: int = 200,
                   id_col: str = "id") -> dict:
    """Schema-driven inference for a DataFrame: structural types from the
    schema; string columns sniffed on a ``sample_rows`` head sample with
    first-non-null-value semantics (matching the reference's first-seen
    auto-map). One bounded job regardless of corpus size."""
    string_paths: list = []

    def walk(schema: T.StructType, prefix: str, out: dict):
        for f in schema.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            if path == id_col:
                continue
            dt = f.dataType
            if isinstance(dt, T.StructType):
                names = {x.name for x in dt.fields}
                if {"lat", "lon"} <= names:
                    out[path] = "geo_point"
                else:
                    walk(dt, path, out)
            elif isinstance(dt, T.ArrayType):
                if isinstance(dt.elementType, T.StringType):
                    string_paths.append(path)
                elif isinstance(dt.elementType, T.StructType):
                    out[path] = "object"
                    walk(dt.elementType, path, out)
                elif isinstance(dt.elementType, (T.IntegerType, T.LongType,
                                                 T.FloatType, T.DoubleType)):
                    out[path] = "number"
            elif isinstance(dt, T.StringType):
                string_paths.append(path)
            elif isinstance(dt, T.BooleanType):
                out[path] = "boolean"
            elif isinstance(dt, (T.DateType, T.TimestampType,
                                 T.TimestampNTZType)):
                out[path] = "date"
            elif isinstance(dt, T.NumericType):
                out[path] = "number"
        return out

    out: dict = {}
    walk(df.schema, "", out)
    if string_paths:
        from pyspark.sql import functions as F
        sample = df.select(*[F.col(p).alias(f"c{i}")
                             for i, p in enumerate(string_paths)]) \
            .limit(sample_rows).collect()
        for i, path in enumerate(string_paths):
            t = None
            for row in sample:
                v = row[f"c{i}"]
                if isinstance(v, (list, tuple)):
                    v = v[0] if v else None
                if v is not None:
                    t = detect_keyword_or_text(v, path)
                    break
            out[path] = t or "keyword"
    return out


def indexable_fields(mappings: dict) -> dict:
    """The IndexConfig.fields dict: only tokenized types survive
    (SearchEngine.ts:892 — numbers/dates/geo are range/geo-scanned)."""
    return {f: t for f, t in mappings.items() if t in INDEXED_TYPES}
