"""Event-log and lake-table schemas (FIXTURES.md §1-2, BASELINE.json input_hint).

Reference semantics carried over (see SURVEY.md §1.1):
- the ordered ``lsn`` column is the engine-grade version of the reference's
  ``change_time >= start AND < end`` polling window
  (full_incidents/replication_otrs_to_dwh/main.py:60-87);
- ``schema_change`` events model the reference's runtime-discovered
  customFields schema (incidents_for_dashboards/main.py:160-166);
- the ``extra`` map carries values for dynamically added columns, the
  analog of ES variant maps (thehive_to_dwh/transform_load.py:51-171).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- change-event log -------------------------------------------------------

SCHEMA_CHANGE_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # add | rename | widen
        T.StructField("column", T.StringType()),
        T.StructField("new_name", T.StringType()),   # rename only
        T.StructField("new_type", T.StringType()),   # add/widen: spark ddl type
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D | S (schema)
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),       # raw, un-normalized
        T.StructField("content", T.StringType()),    # null for D and S
        T.StructField("ts", T.TimestampType()),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
        T.StructField("schema_change", SCHEMA_CHANGE_TYPE),
    ]
)

# --- lake table -------------------------------------------------------------

# Fixed (input_hint) columns; dynamic columns appended by schema evolution.
BASE_TABLE_FIELDS = [
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
    T.StructField("content_sha256", T.StringType()),
    T.StructField("_last_lsn", T.LongType()),  # engine lineage column
]

BASE_TABLE_SCHEMA = T.StructType(BASE_TABLE_FIELDS)

KEY_COLS = ["repo", "path"]

# Names a schema_change event may never touch: the table's base fields,
# every event-log field name the merge references by name (a dyn column
# called 'op' or 'extra' would make the merge join's column references
# ambiguous and crash every subsequent batch), and the engine's
# underscore namespace ('_bucket' is the write partitioner; all '_'-
# prefixed names are reserved for internal expressions).
PROTECTED_COLS = {f.name for f in BASE_TABLE_FIELDS} | {
    f.name for f in EVENT_SCHEMA
}


def ddl_to_type(ddl: str) -> T.DataType:
    """Parse a DDL type string ('int', 'bigint', 'string', ...)."""
    return T._parse_datatype_string(ddl)  # noqa: SLF001 - public enough, stable


# Widening lattice the engine accepts (Iceberg's legal promotions).
WIDEN_OK = {
    ("integer", "long"),
    ("integer", "double"),
    ("long", "double"),
    ("float", "double"),
    ("integer", "string"),
    ("long", "string"),
    ("double", "string"),
}
