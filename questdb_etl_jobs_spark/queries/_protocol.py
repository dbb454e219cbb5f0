"""Shared canonicalization fragments for the differential-oracle protocol.

Floats: a plain ``SUM(double)`` accumulates in partition order — Spark's
order differs run to run and from DuckDB's, and at 60k terms the double
error reaches the 4th decimal of 1e9-scale sums. So every cross-engine sum
routes through exact decimal arithmetic of pre-rounded terms:

    ROUND(CAST(SUM(CAST(ROUND(term, 4) AS DECIMAL(28,4))) AS DOUBLE), 4)

identical in Spark SQL and DuckDB, order-independent by construction.
Averages reuse the exact sum divided by an exact count. Value-level floats
just get ROUND(x, 4) (identical doubles in, identical doubles out).
"""

from __future__ import annotations

from pathlib import Path

#: Absolute fixture locations (the oracle SQL embeds these paths).
FIXTURE_DIR = Path(__file__).resolve().parents[2] / "tests" / "fixtures"
PURCHASES_SMALL = str(FIXTURE_DIR / "purchases_small.csv")
PURCHASES_HOURLY_DIR = str(FIXTURE_DIR / "purchases")
PURCHASES_MALFORMED = str(FIXTURE_DIR / "purchases_malformed.csv")

#: DuckDB read_csv clause for reference-format purchase files.
DUCK_PURCHASES_CSV = (
    "read_csv('{path}', header=false, delim=',', "
    "columns={{'email':'VARCHAR','item_id':'VARCHAR','quantity':'VARCHAR',"
    "'price':'VARCHAR','purchase_date':'VARCHAR'}})"
)


def duck_purchases(path: str) -> str:
    return DUCK_PURCHASES_CSV.format(path=path)


def sum4(term: str, alias: str) -> str:
    """Order-independent 4-decimal sum fragment (valid in both dialects)."""
    return (
        f"ROUND(CAST(SUM(CAST(ROUND({term}, 4) AS DECIMAL(28,4))) AS DOUBLE), 4)"
        f" AS {alias}"
    )


def avg4(term: str, alias: str) -> str:
    """Order-independent average of 4-decimal-rounded terms.

    NO outer ROUND, deliberately: the quotient is a derived rational that
    can land on an exact ``.xxxx5`` shortest repr, where Spark's ROUND
    (on the repr) and DuckDB's (on the binary value) disagree — observed
    at sf0.1. The un-rounded quotient is bit-identical instead: the
    decimal sum converts to double exactly-rounded in both engines (the
    scaled integer stays below 2^53 at these magnitudes) and one IEEE
    division of identical operands has one correct answer.
    """
    return (
        f"CAST(SUM(CAST(ROUND({term}, 4) AS DECIMAL(28,4))) AS DOUBLE)"
        f" / COUNT({term}) AS {alias}"
    )


def round4(term: str, alias: str) -> str:
    return f"ROUND({term}, 4) AS {alias}"


def spark_round4(term: str, alias: str) -> str:
    """DuckDB fragment replicating Spark's ROUND-on-double semantics.

    Spark's Round(double) goes through ``BigDecimal.valueOf`` — i.e. it
    rounds the *shortest decimal repr* of the double, not its exact binary
    value, so a double printing as "0.59825" rounds HALF_UP to 0.5983 while
    plain ROUND of the binary (0.598249999…) gives 0.5982. The
    VARCHAR→DECIMAL round-trip reproduces that: DuckDB's double→VARCHAR is
    the same shortest round-trip repr. Use for derived doubles that can
    land on exact .xxxx5 reprs (rational arithmetic); plain ``round4`` is
    fine for full-entropy doubles.
    """
    return (
        f"CAST(ROUND(CAST(CAST({term} AS VARCHAR) AS DECIMAL(38,18)), 4) "
        f"AS DOUBLE) AS {alias}"
    )
