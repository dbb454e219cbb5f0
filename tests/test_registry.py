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


def test_window_covers_value_verified_a3():
    # q27 (HLL) ceded its window slot to the value-verified KMV twin q74;
    # q27 remains in the full registry, now oracle-paired via the
    # exact-count + accuracy-bound row pattern.
    assert "q74_kmv_distinct" in qreg._PRIORITY
    assert "q27_approx_distinct_users" in set(qreg.spark_queries())
