"""String normalization primitives.

The reference has two distinct normalization regimes that MUST stay
distinct (SURVEY.md §2.11 quirk table):

* **Blocking** uses HAPI's default string-param semantics — case- and
  accent-insensitive *starts-with* (StringParam usage at
  IdentityMatching.java:966-976, 1006).  -> ``hapi_norm`` + prefix keys.
* **Scoring** uses case-sensitive exact equality
  (IdentityMatching.java:362,371). -> raw values compared directly.

``norm_ws`` is the content normalizer feeding the SSN-analog identity
(lowercase + whitespace collapse); it is written with only regexp_replace/
lower/trim so the same expression exists verbatim in DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal accent-fold table (HAPI uses ICU normalization; corpus paths are
# ASCII-dominant, so a translate table covers the Latin-1 range we generate).
_ACCENTS = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_PLAIN = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"


def strip_accents(col: Column) -> Column:
    return F.translate(col, _ACCENTS, _PLAIN)


def hapi_norm(col: Column) -> Column:
    """HAPI string-search normalization: accent-fold + lowercase + trim."""
    return F.lower(F.trim(strip_accents(col)))


def norm_ws(col: Column) -> Column:
    """Lowercase + collapse all whitespace runs to single spaces + trim.

    DuckDB equivalent: trim(regexp_replace(lower(x), '\\s+', ' ', 'g')).
    """
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens_of(col: Column) -> Column:
    """Word tokens of normalized text (empty tokens dropped)."""
    return F.filter(F.split(norm_ws(col), " "), lambda t: t != "")
