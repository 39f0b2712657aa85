"""Test-only oracle: a direct Python port of the reference decision logic.

``score_match`` ports IdentityMatchingScorer.scoreMatch
(/root/reference/src/main/java/ca/uhn/fhir/jpa/starter/operations/models/
IdentityMatchingScorer.java:38-69); ``match_weight`` ports getMatchWeight
(:71-89). Used ONLY by pytest to verify the Catalyst grade/weight
expressions over exhaustive and randomized flag vectors, and to compute
the pairwise-F1 gate (BASELINE.md metric) against the Spark pipeline's
decisions. Never imported by the engine.
"""

from __future__ import annotations

from dataclasses import dataclass, fields


@dataclass(frozen=True)
class Flags:
    mrn_match: bool = False
    digital_id_match: bool = False
    ssn_match: bool = False
    ssn_last4_match: bool = False
    drivers_license_match: bool = False
    passport_match: bool = False
    insurance_member_match: bool = False
    insurance_subscriber_match: bool = False
    family_name_match: bool = False
    first_name_match: bool = False
    middle_name_match: bool = False
    middle_initial_match: bool = False
    birth_sex_match: bool = False
    birth_date_match: bool = False
    phone_match: bool = False
    email_match: bool = False
    address_line_match: bool = False
    address_city_match: bool = False
    address_state_match: bool = False
    address_postal_match: bool = False


FLAG_FIELDS = [f.name for f in fields(Flags)]


def score_match(f: Flags) -> float:
    """IdentityMatchingScorer.java:38-69, line for line."""
    ff = f.first_name_match and f.family_name_match
    ffd = ff and f.birth_date_match
    if (
        (f.mrn_match or f.digital_id_match)
        or (ff and f.drivers_license_match)
        or (ff and f.passport_match)
        or (ff and f.insurance_member_match)
        or (ffd and f.insurance_subscriber_match)
        or (ff and f.ssn_match)
    ):
        return 0.99
    if (
        (ff and f.insurance_subscriber_match)
        or (ffd and f.address_line_match and f.address_postal_match)
        or (ffd and f.address_line_match and f.address_city_match and f.address_state_match)
        or (ffd and f.email_match)
    ):
        return 0.80
    if (
        (ffd and f.birth_sex_match and f.ssn_last4_match)
        or (ffd and f.birth_sex_match and f.phone_match)
        or (ffd and f.birth_sex_match and f.address_postal_match)
        or (ffd and f.birth_sex_match and f.middle_name_match)
        or (ffd and f.phone_match)
    ):
        return 0.70
    if (
        (ffd and f.birth_sex_match and f.middle_initial_match)
        or (ffd and f.birth_sex_match)
        or ffd
    ):
        return 0.60
    return 0.10


def match_weight(f: Flags) -> int:
    """IdentityMatchingScorer.java:71-89."""
    w = 0
    if f.passport_match:
        w += 10
    if f.drivers_license_match:
        w += 10
    if (
        (f.address_line_match and f.address_postal_match)
        or (f.address_city_match and f.address_state_match)
        or f.phone_match
        or f.email_match
        or f.ssn_match
        or f.insurance_subscriber_match
        or f.mrn_match
    ):
        w += 5
    if f.first_name_match and f.family_name_match:
        w += 3
    if f.birth_date_match:
        w += 2
    return w


def mdm_verdict(f: Flags) -> str:
    """mdm-rules.json:43-46 verdict map over the two configured matchers."""
    if f.first_name_match and f.family_name_match:
        return "MATCH"
    if f.first_name_match:
        return "POSSIBLE_MATCH"
    return "NO_MATCH"
