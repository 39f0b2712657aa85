"""identity_matching_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the capabilities of HL7-FAST/identity-matching (a Java/HAPI-FHIR
patient-matching server, reference at /root/reference) as an idiomatic
Spark DataFrame pipeline over a corpus table
``files(repo, path, commit, lang, content)``:

    normalize -> blocking keys -> salted self-equi-join -> pairwise
    comparator vector -> match-grade decision table -> match edges ->
    iterative connected components -> entity clusters

The decision semantics (comparator set, grade tiers {0.99,0.80,0.70,0.60,0.10},
completeness weights, MDM verdict map) are ported 1:1 from the reference
(see ``operators/grade.py`` docstrings for file:line citations); the
execution is pure Catalyst: Column expressions, broadcast joins, AQE,
and batched pandas/Arrow UDFs for the few fuzzy comparators Spark lacks.
No per-row Python anywhere.
"""

from identity_matching_spark.config import MatchConfig

__all__ = ["MatchConfig"]
__version__ = "0.1.0"
