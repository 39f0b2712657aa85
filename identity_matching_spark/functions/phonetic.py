"""Phonetic encoders (MDM matcher algorithms, mdm-rules.json:25-42).

The reference deployment configures COLOGNE (given name) and SOUNDEX
(family name); HAPI's matcher slot also offers METAPHONE. Spark has a
builtin ``F.soundex``; Cologne ("Kölner Phonetik", Postel 1969) and a
basic Metaphone are implemented here from their public algorithm
descriptions and exposed as **batched pandas UDFs** (Arrow transfer, no
per-row Python serde)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- Cologne phonetics (pure-python reference implementation) ---------------

_COLOGNE_BEFORE_VOWEL = {"c": "4"}  # handled inline


def cologne_encode(word: str | None) -> str | None:
    """Kölner Phonetik. Public algorithm (Postel 1969, de.wikipedia
    'Kölner Phonetik'): letters -> digit classes with context rules;
    collapse runs; drop non-leading zeros."""
    if word is None:
        return None
    w = "".join(ch for ch in word.lower() if ch.isalpha())
    if not w:
        return ""
    vowels = set("aeijouyäöü")
    csz, sz, ckq = set("csz"), set("sz"), set("ckq")
    c_init, c_mid = set("ahkloqrux"), set("ahkoqux")
    codes = []
    n = len(w)
    for i, ch in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i < n - 1 else ""
        if ch in vowels:
            c = "0"
        elif ch == "b":
            c = "1"
        elif ch == "p":
            c = "3" if nxt == "h" else "1"
        elif ch in ("d", "t"):
            c = "8" if nxt in csz else "2"
        elif ch in ("f", "v", "w"):
            c = "3"
        elif ch in ("g", "k", "q"):
            c = "4"
        elif ch == "c":
            if i == 0:
                c = "4" if nxt in c_init else "8"
            elif prev in sz:
                c = "8"
            else:
                c = "4" if nxt in c_mid else "8"
        elif ch == "x":
            c = "8" if prev in ckq else "48"
        elif ch == "l":
            c = "5"
        elif ch in ("m", "n"):
            c = "6"
        elif ch == "r":
            c = "7"
        elif ch in ("s", "z", "ß"):
            c = "8"
        else:  # h and anything unclassified
            c = ""
        codes.append(c)
    # collapse adjacent duplicates, then drop zeros except leading
    flat = "".join(codes)
    out = []
    for ch in flat:
        if out and out[-1] == ch:
            continue
        out.append(ch)
    collapsed = "".join(out)
    if not collapsed:
        return ""
    return collapsed[0] + collapsed[1:].replace("0", "")


def metaphone_encode(word: str | None, max_len: int = 6) -> str | None:
    """Compact Metaphone variant (Philips 1990) — the common simplified
    transform: good enough for blocking-key generation; not the full
    double-metaphone automaton."""
    if word is None:
        return None
    w = "".join(ch for ch in word.lower() if ch.isalpha())
    if not w:
        return ""
    # initial-letter exceptions
    for pre, rep in (("kn", "n"), ("gn", "n"), ("pn", "n"), ("ae", "e"), ("wr", "r"), ("x", "s")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    out = []
    vowels = set("aeiou")
    i, n = 0, len(w)
    while i < n and len(out) < max_len:
        ch = w[i]
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i < n - 1 else ""
        if ch in vowels:
            if i == 0:
                out.append(ch.upper())
        elif ch == prev and ch != "c":
            pass
        elif ch in "bfjlmnr":
            out.append(ch.upper())
        elif ch == "c":
            if nxt == "h":
                out.append("X")
                i += 1
            elif nxt in ("i", "e", "y"):
                out.append("S")
            else:
                out.append("K")
        elif ch == "d":
            if nxt == "g" and i + 2 < n and w[i + 2] in ("i", "e", "y"):
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif ch == "g":
            if nxt == "h":
                out.append("K")
                i += 1
            elif nxt in ("i", "e", "y"):
                out.append("J")
            else:
                out.append("K")
        elif ch == "h":
            if prev in vowels and nxt not in vowels:
                pass
            else:
                out.append("H")
        elif ch == "k":
            if prev != "c":
                out.append("K")
        elif ch == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif ch == "q":
            out.append("K")
        elif ch == "s":
            if nxt == "h":
                out.append("X")
                i += 1
            else:
                out.append("S")
        elif ch == "t":
            if nxt == "h":
                out.append("0")
                i += 1
            else:
                out.append("T")
        elif ch == "v":
            out.append("F")
        elif ch == "w":
            if nxt in vowels:
                out.append("W")
        elif ch == "x":
            out.append("KS")
        elif ch == "y":
            if nxt in vowels:
                out.append("Y")
        elif ch == "z":
            out.append("S")
        i += 1
    return "".join(out)[:max_len]


# Spark's UTF8String.soundex mapping: a..z -> digit class; '7' marks the
# transparent letters h/w (skipped, previous code persists); vowels are
# '0' (reset). Verified byte-for-byte vs F.soundex on the full stem
# vocabulary plus edge cases (tests/test_functions.py).
_SOUNDEX_MAP = dict(zip("abcdefghijklmnopqrstuvwxyz", "01230127022455012623017202"))


def soundex_encode(word: str | None) -> str | None:
    """Pure-python twin of Spark's F.soundex (UTF8String.soundex), exact
    on non-alpha input too: a non-letter RESETS the previous code (so a
    repeated class after '_' or a digit is re-emitted), h/w are
    transparent, output is first letter + 3 codes zero-padded."""
    if word is None:
        return None
    if not word:
        return word
    # Lowercase ASCII only: str.lower() on e.g. 'İ' returns the TWO-char
    # 'i̇', which passes an 'a'<='z' range test and would KeyError below.
    # Spark's byte-wise UTF8String.soundex sees non-ASCII bytes as
    # non-letters (reset / return-input), so mirror that exactly.
    first = word[0].lower() if "A" <= word[0] <= "Z" else word[0]
    if not ("a" <= first <= "z"):
        return word  # F.soundex returns input unchanged when not encodable
    out = [word[0].upper()]
    last = _SOUNDEX_MAP[first]
    for ch in word[1:]:
        c = ch.lower() if "A" <= ch <= "Z" else ch
        if not ("a" <= c <= "z"):
            last = "0"
            continue
        code = _SOUNDEX_MAP[c]
        if code == "7":  # h/w transparent: previous code persists
            continue
        if code != "0" and code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code
    return "".join(out).ljust(4, "0")


# --- pandas UDF wrappers ----------------------------------------------------


@F.pandas_udf(T.StringType())
def cologne_udf(s: pd.Series) -> pd.Series:
    return s.map(cologne_encode, na_action="ignore")


@F.pandas_udf(T.StringType())
def metaphone_udf(s: pd.Series) -> pd.Series:
    return s.map(metaphone_encode, na_action="ignore")
