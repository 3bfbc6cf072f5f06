"""Golden tests freezing the reference's audit/normalize semantics
(SURVEY.md §5.1 — [R:audit.py], [R:tags.py]) + DuckDB-twin equivalence."""

import duckdb
import pyarrow as pa
import pytest

from wrangle_openstreetmap_data_ray.functions import normalize as nz

GOLDEN_STREETS = [
    ("Jln Besar", "Jalan Besar"),
    ("Serangoon Rd", "Serangoon Road"),
    ("Bt Timah Ave. 4", "Bukit Timah Avenue 4"),
    ("Lor 7 Toa Payoh", "Lorong 7 Toa Payoh"),
    ("Upp Changi Rd East", "Upper Changi Road East"),
    ("North Lincoln Avenue", "North Lincoln Avenue"),   # already canonical
    ("Orchard Blvd", "Orchard Boulevard"),
    ("Clementi St. 12", "Clementi Street 12"),
    ("Kg Bahru Rd", "Kampong Bahru Road"),
    ("Tg Pagar Dr", "Tanjong Pagar Drive"),
    ("Holland Cres", "Holland Crescent"),
    ("Eng Kong Ter", "Eng Kong Terrace"),
    ("Stirling Road", "Stirling Road"),                 # "St" must NOT fire inside words
    ("Dover Rise", "Dover Rise"),
    ("Jln Bt Merah", "Jalan Bukit Merah"),              # two abbrevs, one name
    ("Ave Maria Ln", "Avenue Maria Lane"),              # first-token abbrev
]

GOLDEN_POSTCODES = [
    ("408564", "408564"),
    ("S 408564", "408564"),       # strip non-digits then valid
    ("Singapore 560123", "560123"),
    ("79123", None),              # 5-digit Malaysian (Johor)
    ("830001", None),             # prefix 83 out of district range 01..82
    ("005000", None),             # prefix 00 below range
    ("12345", None),
    ("4085AB", None),
    ("", None),
]


def test_update_name_golden():
    got = nz.normalize_street(pa.array([s for s, _ in GOLDEN_STREETS])).to_pylist()
    assert got == [e for _, e in GOLDEN_STREETS]


def test_update_name_idempotent():
    once = nz.normalize_street(pa.array([s for s, _ in GOLDEN_STREETS]))
    twice = nz.normalize_street(once)
    assert once.to_pylist() == twice.to_pylist()


def test_update_name_scalar_twin():
    for s, e in GOLDEN_STREETS:
        assert nz.normalize_street_py(s) == e


def test_update_name_duckdb_twin():
    con = duckdb.connect()
    vals = [s for s, _ in GOLDEN_STREETS]
    sql = nz.normalize_street_sql("s")
    got = [r[0] for r in con.execute(
        f"SELECT {sql} FROM (SELECT unnest(?) AS s)", [vals]).fetchall()]
    assert got == [e for _, e in GOLDEN_STREETS]


def test_clean_postcode_golden():
    got = nz.clean_postcode(pa.array([s for s, _ in GOLDEN_POSTCODES])).to_pylist()
    assert got == [e for _, e in GOLDEN_POSTCODES]


def test_clean_postcode_duckdb_twin():
    con = duckdb.connect()
    vals = [s for s, _ in GOLDEN_POSTCODES]
    got = [r[0] for r in con.execute(
        f"SELECT {nz.clean_postcode_sql('s')} FROM (SELECT unnest(?) AS s)", [vals]).fetchall()]
    assert got == [e for _, e in GOLDEN_POSTCODES]


def test_classify_keys_golden():
    keys = ["amenity", "addr:street", "odd key!", "Name", "a:b:c", "addr:street:block"]
    got = nz.classify_keys(pa.array(keys)).to_pylist()
    assert got == ["lower", "lower_colon", "problemchars", "other", "other", "other"]


def test_classify_keys_duckdb_twin():
    con = duckdb.connect()
    keys = ["amenity", "addr:street", "odd key!", "Name", "a:b:c"]
    got = [r[0] for r in con.execute(
        f"SELECT {nz.classify_keys_sql('s')} FROM (SELECT unnest(?) AS s)", [keys]).fetchall()]
    assert got == nz.classify_keys(pa.array(keys)).to_pylist()


def test_street_type_and_audit_mask():
    names = ["Lorong 7 Toa Payoh", "Serangoon Road", "Serangoon Rd",
             "Jalan Besar", "Some St."]
    st = nz.street_type(pa.array(names)).to_pylist()
    assert st == ["Lorong", "Road", "Rd", "Jalan", "St"]
    mask = nz.audit_street_mask(pa.array(names)).to_pylist()
    assert mask == [False, False, True, False, True]


def test_audit_then_normalize_clears_flags():
    """The reference contract: after update_name, audited names pass."""
    dirty = pa.array([s for s, _ in GOLDEN_STREETS])
    fixed = nz.normalize_street(dirty)
    flagged = nz.audit_street_mask(fixed).to_pylist()
    # every golden expected form has an expected type (by construction)
    bad = [f for f, (_, exp) in zip(flagged, GOLDEN_STREETS) if f]
    assert not bad
