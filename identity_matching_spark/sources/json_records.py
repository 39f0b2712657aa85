"""JSON parse/serialize for record rows (F12).

The reference ingests and emits FHIR resources as JSON
(DataInitializer.java:69 parses seed Patient bundles;
IdentityMatching.java:206-208 parses the Organization entry). The engine
analog is a JSON-lines record surface over the canonical
(repo, path, commit, lang, content) shape from BASELINE.json's
input_hint: ``records_to_json`` serializes with ``to_json`` (JVM-side,
proper string escaping), ``records_from_json`` parses with ``from_json``
against an explicit schema — both whole-stage-codegen expressions, no
Python in the data path. PERMISSIVE mode surfaces malformed rows as a
null struct rather than failing the job (the 100 TB-scale choice:
quarantine, don't abort)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECORD_JSON_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)
_FIELDS = ["repo", "path", "commit", "lang", "content"]


def records_to_json(files: DataFrame, id_col: str | None = None) -> DataFrame:
    """(repo, path, commit, lang, content)[, id] -> ([id,] json)."""
    cols = [F.col(id_col)] if id_col else []
    return files.select(*cols, F.to_json(F.struct(*_FIELDS)).alias("json"))


def records_from_json(
    df: DataFrame, json_col: str = "json", id_col: str | None = None
) -> DataFrame:
    """([id,] json) -> parsed record columns; malformed json -> null fields.

    Row identity survives without an id column: ``commit`` is unique per
    record in the canonical shape."""
    cols = [F.col(id_col)] if id_col else []
    parsed = df.select(
        *cols, F.from_json(F.col(json_col), RECORD_JSON_SCHEMA).alias("r")
    )
    keep = [id_col] if id_col else []
    return parsed.select(*keep, *[F.col(f"r.{f}").alias(f) for f in _FIELDS])
