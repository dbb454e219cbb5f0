"""Registry-window ordering contract (SURVEY.md §2.11).

The external verification driver checks the FIRST 50 registry entries in
dict order, so the ordering is load-bearing: these tests pin it so an
innocent-looking rename can't silently evict an operator's covering query
from the driver's window.
"""

from questdb_etl_jobs_spark import queries as qreg


def test_first_50_equal_priority_list():
    ordered = list(qreg.spark_queries())
    assert len(qreg._PRIORITY) == 50
    assert tuple(ordered[:50]) == qreg._PRIORITY


def test_tail_sorted_by_numeric_query_id():
    ordered = list(qreg.spark_queries())
    tail = ordered[50:]
    ids = [qreg._query_id(n) for n in tail]
    assert ids == sorted(ids), "tail must follow in numeric query-id order"


def test_priority_names_all_registered():
    registered = set(qreg.spark_queries())
    missing = [n for n in qreg._PRIORITY if n not in registered]
    assert not missing, f"priority window references unknown queries: {missing}"


def test_every_query_is_oracle_paired():
    """Structural invariant (round-8 VERDICT task #7): registration
    without an oracle fails loudly, and the live registry has one oracle
    per query."""
    import pytest

    with pytest.raises(ValueError, match="must carry an oracle"):
        qreg.dq("q999_no_oracle", None)(lambda spark, sf_dir: None)
    assert "q999_no_oracle" not in qreg.REGISTRY
    assert set(qreg.oracle_queries()) == set(qreg.spark_queries())


def _covers_union(names):
    qreg._load()
    out = set()
    for n in names:
        spec = qreg.REGISTRY[n]
        out |= {c.strip() for c in spec.covers.split(",") if c.strip()}
    return out


def test_window_is_a_covering_set():
    """Every SURVEY.md §2 operator id exercised ANYWHERE in the registry
    is exercised by at least one of the driver's first-50 queries — a
    rotation can never silently drop an operator from the hard signal."""
    window = _covers_union(qreg._PRIORITY)
    everything = _covers_union(list(qreg.spark_queries()))
    assert everything - window == set(), (
        f"operator ids uncovered by the driver window: "
        f"{sorted(everything - window)}"
    )


def test_window_includes_post_round6_work():
    """Round-9 rotation (VERDICT r8 task #6): the driver's hard signal
    must exercise round-7/8 operators, not only the round-1..6 surface."""
    recent = {n for n in qreg._PRIORITY if qreg._query_id(n) >= 100}
    assert len(recent) >= 3, f"window has too few recent queries: {recent}"


def test_window_covers_value_verified_a3():
    # A3 (approx count-distinct / mergeable sketches) must be covered
    # in-window by a VALUE-verified sketch query — q74 (KMV) carried
    # this through round 16; round 17's rotation ceded it (rows since
    # round 9) and q157 (t-digest, A3+A5) carries it now. Both stay in
    # the full registry either way.
    window = set(qreg._PRIORITY)
    assert window & {"q74_kmv_distinct", "q157_tdigest_quantiles"}
    assert "q27_approx_distinct_users" in set(qreg.spark_queries())
    assert "q74_kmv_distinct" in set(qreg.spark_queries())


def test_oracle_queries_routes_sf_dir_only_to_parametric():
    """The typed oracle-scale protocol's plumbing contract: an sf_dir
    passed to oracle_queries reaches ONLY builders marked
    sf_parametric; every other callable builds exactly as the driver
    does (no argument)."""
    calls = {}

    def parametric(sf_dir="/default"):
        calls["parametric"] = sf_dir
        return "SELECT 1 AS x"

    parametric.sf_parametric = True

    def plain():
        calls["plain"] = True
        return "SELECT 2 AS x"

    qreg._load()
    added = []
    try:
        qreg.dq("q998_parametric_probe", parametric)(lambda s, d: None)
        qreg.dq("q997_plain_probe", plain)(lambda s, d: None)
        added = ["q998_parametric_probe", "q997_plain_probe"]
        # A real tier path: the OTHER parametric oracles in the registry
        # also rebuild against it (they read real parquet).
        tier = "/root/testdata/sf0.01"
        out = qreg.oracle_queries(tier)
        assert calls["parametric"] == tier
        assert calls["plain"] is True
        assert out["q998_parametric_probe"] == "SELECT 1 AS x"
        calls.clear()
        qreg.oracle_queries()  # driver shape: no sf_dir
        assert calls["parametric"] == "/default"
    finally:
        for n in added:
            qreg.REGISTRY.pop(n, None)
