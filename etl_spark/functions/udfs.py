"""Vectorized pandas UDFs — the ONLY Python-side row transforms in the engine.

The reference does all of this per-row in plain Python (the anti-pattern):
md5 identity hashing at thehive_to_dwh/transform_load.py:194 and
replication_otrs_to_dwh/postgresql/upload.py:339; lang/category
canonicalization via per-row reference-table lookups at
thehive_to_dwh/postgresql/insert.py:228-247. Here both are Arrow-batched
(input_hint: "vectorized pandas/Arrow UDFs, no per-row Python").
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical lang dimension (FIXTURES.md §3 dim_langs, lowercased raw -> canon)
LANG_CANON: dict[str, str] = {
    "python": "py", "py3": "py", "py": "py",
    "c": "c",
    "c++": "cpp", "cpp": "cpp", "cxx": "cpp",
    "rust": "rs", "rs": "rs",
    "go": "go", "golang": "go",
    "markdown": "md", "md": "md",
    "java": "java",
    "shell": "sh", "sh": "sh", "bash": "sh",
    "javascript": "js", "js": "js",
    "typescript": "ts", "ts": "ts",
}


@F.pandas_udf(T.StringType())
def sha256_hex(s: pd.Series) -> pd.Series:
    """sha256 hex of a string column; null-safe. Arrow-batched."""
    return s.map(
        lambda x: None if x is None else hashlib.sha256(x.encode("utf-8")).hexdigest()
    )


@F.pandas_udf(T.StringType())
def lang_norm(s: pd.Series) -> pd.Series:
    """Normalize raw language labels to the canonical short set.

    Unknown labels fall back to their lowercase form (the reference keeps
    unknown vendors/categories as-is, insert.py:240-247).
    """
    low = s.str.lower()
    return low.map(LANG_CANON).fillna(low)


def lang_norm_expr(col):
    """JVM-side equivalent of lang_norm for plan-pure pipelines.

    A static map lookup is expressible as a chained CASE — whole-stage
    codegen keeps it in the JVM. Kept alongside the pandas UDF so both
    paths are tested equal; the engine default is this one (faster), the
    pandas UDF is the proof of the Arrow path.
    """
    c = F.lower(col)
    expr = None
    for raw, canon in LANG_CANON.items():
        expr = F.when(c == raw, F.lit(canon)) if expr is None else expr.when(c == raw, F.lit(canon))
    return expr.otherwise(c)
