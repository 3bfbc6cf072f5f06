"""Reference-semantics audit/normalize kernels (the flagship scalar fns).

Reconstructed from the reference per SURVEY.md §2 (reference mount was empty;
semantics frozen here + in golden tests):

- [R:tags.py::key_type]            — M2 key classification regexes
- [R:data.py::shape_element]       — M3 problem-char filter
- [R:audit.py::audit_street_type]  — M4 street-type audit (incl. Malay
  first-token order: "Jalan Besar", "Lorong 7 Toa Payoh")
- [R:audit.py::update_name]        — M5 abbreviation → canonical mapping
- [R:audit.py::update_postcode]    — M6 Singapore postal-code validation

Every kernel is vectorized with ``pyarrow.compute`` and ships a DuckDB-SQL
twin (``*_sql``) generated from the SAME mapping tables, so the Ray pipeline
and the driver's oracle cannot drift.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- M2 / M3

# [R:tags.py] — the canonical Udacity key-classification regexes.
LOWER_RE = r"^[a-z]+$"
LOWER_COLON_RE = r"^[a-z]+:[a-z]+$"
PROBLEMCHARS_RE = r"[=\+/&<>;'\"\?%#$@\,\. \t\r\n]"


def classify_keys(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Bucket tag keys into lower / lower_colon / problemchars / other."""
    lower = pc.match_substring_regex(keys, LOWER_RE)
    lower_colon = pc.match_substring_regex(keys, LOWER_COLON_RE)
    problem = pc.match_substring_regex(keys, PROBLEMCHARS_RE)
    return pc.case_when(
        pc.make_struct(lower, lower_colon, problem),
        "lower", "lower_colon", "problemchars", "other",
    )


def classify_keys_sql(col: str) -> str:
    """DuckDB CASE twin of classify_keys (same precedence order)."""
    return (
        f"CASE WHEN regexp_matches({col}, '{LOWER_RE}') THEN 'lower' "
        f"WHEN regexp_matches({col}, '{LOWER_COLON_RE}') THEN 'lower_colon' "
        f"""WHEN regexp_matches({col}, '[=\\+/&<>;''"\\?%#$@\\,\\. \\t\\r\\n]') THEN 'problemchars' """
        f"ELSE 'other' END"
    )


def problem_key_mask(keys) -> pa.Array:
    """True where a tag key must be dropped ([R:data.py::shape_element] M3)."""
    return pc.match_substring_regex(keys, PROBLEMCHARS_RE)


# --------------------------------------------------------------------- M5

# [R:audit.py::mapping] — abbreviation → canonical street token
# (FIXTURES.md F5 freezes this table). Applied longest-abbr-first,
# word-boundary anchored, optional trailing period, case-sensitive,
# at ANY token position (Singapore names carry the type as first OR last
# token: "Jln Besar", "Serangoon Rd").
STREET_MAPPING: list[tuple[str, str]] = [
    ("Cres", "Crescent"),
    ("Blvd", "Boulevard"),
    ("Upp", "Upper"),
    ("Jln", "Jalan"),
    ("Lor", "Lorong"),
    ("Ave", "Avenue"),
    ("Ter", "Terrace"),
    ("Rd", "Road"),
    ("St", "Street"),
    ("Dr", "Drive"),
    ("Ln", "Lane"),
    ("Bt", "Bukit"),
    ("Kg", "Kampong"),
    ("Tg", "Tanjong"),
]
# invariant: iteration order is longest-first so e.g. "Cres" wins over a
# later short key; equal lengths keep table order.
assert [len(a) for a, _ in STREET_MAPPING] == sorted(
    [len(a) for a, _ in STREET_MAPPING], reverse=True)

# [R:audit.py::expected] — street types NOT flagged by the audit.
EXPECTED_STREET_TYPES = [
    "Avenue", "Boulevard", "Road", "Street", "Lane", "Drive", "Walk", "Way",
    "Link", "Crescent", "Close", "Terrace", "Place", "Park", "Hill", "View",
    "Rise", "Green", "Grove", "Loop", "Square", "Central", "North", "South",
    "East", "West", "Jalan", "Lorong", "Bukit", "Kampong", "Tanjong", "Taman",
]
# Malay-order types appear as the FIRST token ([R:audit.py] Singapore twist).
MALAY_FIRST_TOKEN_TYPES = {"Jalan", "Lorong", "Bukit", "Kampong", "Tanjong", "Taman"}

# [R:audit.py::street_type_re] — last whitespace-delimited token, opt. period;
# Singapore twist: numbered streets ("Ang Mo Kio Avenue 3") carry the type
# before the trailing number. (named groups: pyarrow extract_regex needs them)
STREET_TYPE_RE = r"(?P<t>\S+?)\.?(?:\s+\d+)?$"
FIRST_TOKEN_RE = r"^(?P<t>\S+?)\.?(?:\s|$)"


def _abbr_pattern(abbr: str) -> str:
    r"""Word-boundary-anchored pattern with optional trailing period.

    RE2-compatible (no lookarounds) so the identical pattern string runs in
    both pyarrow (RE2) and DuckDB (RE2): ``\bRd\b\.?``.
    """
    return rf"\b{re.escape(abbr)}\b\.?"


def normalize_street(values) -> pa.Array | pa.ChunkedArray:
    """[R:audit.py::update_name] — canonicalize abbreviations, vectorized.

    One ``replace_substring_regex`` pass per mapping entry (14 passes),
    all inside Arrow — no Python per-row work.
    """
    out = values
    for abbr, full in STREET_MAPPING:
        out = pc.replace_substring_regex(out, _abbr_pattern(abbr), full)
    return out


def normalize_street_sql(col: str) -> str:
    """DuckDB expression twin of normalize_street (same table, same order)."""
    expr = col
    for abbr, full in STREET_MAPPING:
        expr = f"regexp_replace({expr}, '\\b{abbr}\\b\\.?', '{full}', 'g')"
    return expr


def normalize_street_py(name: str) -> str:
    """Scalar twin (used by golden tests / tiny driver-side fixes)."""
    for abbr, full in STREET_MAPPING:
        name = re.sub(_abbr_pattern(abbr), full, name)
    return name


def street_type(values) -> pa.Array:
    """[R:audit.py::audit_street_type] — extract the *type* token per name:
    the first token when it is a Malay-order type, else the last token."""
    last = pc.struct_field(pc.extract_regex(values, STREET_TYPE_RE), "t")
    first = pc.struct_field(pc.extract_regex(values, FIRST_TOKEN_RE), "t")
    is_malay = pc.is_in(first, value_set=pa.array(sorted(MALAY_FIRST_TOKEN_TYPES)))
    return pc.if_else(is_malay, first, last)


def audit_street_mask(values) -> pa.Array:
    """True where the street type is NOT in the expected list (flagged)."""
    st = street_type(values)
    ok = pc.is_in(st, value_set=pa.array(EXPECTED_STREET_TYPES))
    return pc.and_kleene(pc.is_valid(st), pc.invert(ok))


# --------------------------------------------------------------------- M6

# [R:audit.py::audit_postcode] — Singapore postcodes: exactly 6 digits,
# 2-digit district prefix 01..82. The over-wide extract contains 5-digit
# Malaysian (Johor 79xxx-81xxx) codes and typos.
POSTCODE_RE = r"^\d{6}$"
DISTRICT_MIN, DISTRICT_MAX = 1, 82


def clean_postcode(values) -> pa.Array:
    """[R:audit.py::update_postcode] — strip non-digits; keep iff the result
    is a valid SG postcode, else null (caller quarantines nulls)."""
    digits = pc.replace_substring_regex(values, r"\D", "")
    valid = pc.match_substring_regex(digits, POSTCODE_RE)
    prefix = pc.if_else(valid, pc.utf8_slice_codeunits(digits, 0, 2), None)
    # cast prefix to int for the district range check
    pref_i = pc.cast(prefix, pa.int32())
    in_range = pc.and_kleene(
        pc.greater_equal(pref_i, DISTRICT_MIN), pc.less_equal(pref_i, DISTRICT_MAX))
    return pc.if_else(pc.and_kleene(valid, in_range), digits, None)


def clean_postcode_sql(col: str) -> str:
    digits = f"regexp_replace({col}, '\\D', '', 'g')"
    return (
        f"CASE WHEN regexp_matches({digits}, '{POSTCODE_RE}') "
        f"AND CAST(substr({digits}, 1, 2) AS INT) BETWEEN {DISTRICT_MIN} AND {DISTRICT_MAX} "
        f"THEN {digits} ELSE NULL END"
    )


def postcode_valid_mask(values) -> pa.Array:
    return pc.is_valid(clean_postcode(values))
