"""Ship-time report staleness pin (round-10 VERDICT task #2).

The committed registry-facing documents drifted from the live registry
two rounds running (stuck at 165 while HEAD registered 169), so the
habit gets mechanical enforcement: every registry-sized count any of
these documents states must equal ``len(spark_queries())`` at HEAD, and
the full-registry report must actually contain one verdict line per
registered query. Regenerating the reports is part of shipping a round;
this test makes forgetting impossible to miss.
"""

from __future__ import annotations

import pathlib
import re

from questdb_etl_jobs_spark import queries as qreg

REPO = pathlib.Path(__file__).resolve().parents[1]

#: Documents that state the registry size. Any number ≥ 100 directly
#: modifying "query/queries" (e.g. "169 oracle-paired queries",
#: "169-query differential", "(169 queries)") is treated as a registry
#: count — the driver-window "50-query gate" and test tallies stay
#: below the threshold by construction.
_DOCS = (
    "README.md",
    "SURVEY.md",
    "CORRECTNESS_FULL.md",
    "CORRECTNESS_SF01.md",
    "CHANGELOG.md",
    "BENCH.md",
)

_COUNT_RE = re.compile(
    r"(\d+)(?:[- ]|\s+oracle-paired\s+)quer(?:y|ies)", re.IGNORECASE
)


def test_committed_docs_state_current_registry_size():
    n = len(qreg.spark_queries())
    assert n >= 100  # the ≥100 heuristic below depends on this
    stale: list[str] = []
    for doc in _DOCS:
        text = (REPO / doc).read_text()
        for m in _COUNT_RE.finditer(text):
            k = int(m.group(1))
            if k >= 100 and k != n:
                line = text[: m.start()].count("\n") + 1
                stale.append(f"{doc}:{line} says {k}, registry is {n}")
    assert not stale, "stale registry counts in committed docs:\n" + "\n".join(
        stale
    )
    # The docs that EXIST to state the size must actually state it.
    for doc in ("README.md", "SURVEY.md", "CORRECTNESS_FULL.md",
                "CORRECTNESS_SF01.md"):
        text = (REPO / doc).read_text()
        hits = [int(m.group(1)) for m in _COUNT_RE.finditer(text)]
        assert n in hits, f"{doc} never states the registry size {n}"


def test_full_registry_report_has_one_line_per_query():
    """CORRECTNESS_FULL.md is a real run log, not prose: exactly one
    pass-verdict per registered query, and the ALL GREEN tally matches.
    The sf0.1 report allows skips (Python-computed oracles are pinned
    to sf0.01) but its pass+skip total must still cover the registry."""
    n = len(qreg.spark_queries())
    names = set(qreg.spark_queries())

    full = (REPO / "CORRECTNESS_FULL.md").read_text()
    passes = re.findall(r"^pass (q\w+):", full, re.MULTILINE)
    assert len(passes) == n, (
        f"CORRECTNESS_FULL.md logs {len(passes)} pass lines, registry is {n}"
    )
    assert set(passes) == names

    sf01 = (REPO / "CORRECTNESS_SF01.md").read_text()
    verdicts = re.findall(r"^(pass|skip) (q\w+):", sf01, re.MULTILINE)
    assert len(verdicts) == n, (
        f"CORRECTNESS_SF01.md logs {len(verdicts)} verdicts, registry is {n}"
    )
    assert {q for _, q in verdicts} == names
    assert not [q for v, q in verdicts if v not in ("pass", "skip")]
