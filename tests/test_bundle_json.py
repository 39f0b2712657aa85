"""Searchset-bundle assembly (O3) and JSON record roundtrip (F12)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from identity_matching_spark.operators.bundle import ORG_ID, match_bundle_entries
from identity_matching_spark.sources.json_records import (
    records_from_json,
    records_to_json,
)

SCORED = [
    ("p1", "c9", 0.5),
    ("p1", "c2", 0.9),
    ("p1", "c5", 0.9),  # tie with c2 -> candidate-id ascending
    ("p2", "c1", 0.1),
]


def test_bundle_entry_order_and_totals(spark):
    df = spark.createDataFrame(SCORED, "left_id string, right_id string, score double")
    out = match_bundle_entries(df, base_url="http://h").collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    p1 = sorted(by_probe["p1"], key=lambda r: r["entry_index"])
    # entry 0: Organization include entry, no score (IdentityMatching.java:205-214)
    assert (p1[0]["resource_type"], p1[0]["search_mode"], p1[0]["search_score"]) == (
        "Organization",
        "include",
        None,
    )
    assert p1[0]["resource_id"] == ORG_ID
    assert p1[0]["full_url"] == f"http://h/Organization/{ORG_ID}"
    # patients: score desc, id asc on ties; fullUrl = base/Patient/id
    assert [(r["resource_id"], r["search_score"]) for r in p1[1:]] == [
        ("c2", 0.9),
        ("c5", 0.9),
        ("c9", 0.5),
    ]
    assert p1[1]["full_url"] == "http://h/Patient/c2"
    # total counts Patient entries ONLY (reference setTotal filter)
    assert all(r["bundle_total"] == 3 for r in p1)
    assert all(r["bundle_total"] == 1 for r in by_probe["p2"])
    assert len(by_probe["p2"]) == 2  # org + one patient


def test_json_roundtrip_identity(spark, sf_dir):
    from identity_matching_spark.sources.tables import files_from_documents, load_table

    files = files_from_documents(load_table(spark, sf_dir, "documents")).limit(50)
    back = records_from_json(records_to_json(files))
    cols = ["repo", "path", "commit", "lang", "content"]
    a = sorted(map(tuple, files.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_json_malformed_rows_quarantined_not_fatal(spark):
    df = spark.createDataFrame(
        [(1, '{"repo":"r","path":"p","commit":"c","lang":"py","content":"x"}'),
         (2, "{not json"),
         (3, None)],
        "id long, json string",
    )
    out = {r["id"]: r for r in records_from_json(df, id_col="id").collect()}
    assert out[1]["repo"] == "r" and out[1]["content"] == "x"
    # malformed / null input -> null fields, job still completes
    assert out[2]["repo"] is None and out[3]["repo"] is None
