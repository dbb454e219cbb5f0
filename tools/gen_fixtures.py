"""Generate deterministic reference-format CSV fixtures.

Same *shape* as the reference's synthetic exports (headerless CSV,
columns email,item_id,quantity,price,purchase_date; rows sorted by
purchase_date within each hourly file — reference data_generator.py:39-78
and example/*.csv), but generated from our own seeded PRNG so fixtures are
reproducible and nothing is copied from the reference repo.

Checked-in outputs (regenerate with ``python tools/gen_fixtures.py``):

- tests/fixtures/purchases/2021-03-21T{11,12,13}.csv — hourly batches for
  pipeline + streaming tests
- tests/fixtures/purchases_small.csv — 40-row file used by the DQ-01/05/06
  oracle queries
- tests/fixtures/purchases_malformed.csv — valid rows interleaved with
  wrong-arity / bad-int / bad-timestamp lines for quarantine tests
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

FIXTURES = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

FIRST = ["ada", "grace", "edsger", "barbara", "alan", "donald", "radia", "ken"]
LAST = ["lovelace", "hopper", "dijkstra", "liskov", "turing", "knuth", "perlman"]
DOMAINS = ["example.com", "example.org", "example.net", "mail.test"]


def _emails(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        out.append(
            f"{rng.choice(FIRST)}.{rng.choice(LAST)}{rng.randrange(1000)}"
            f"@{rng.choice(DOMAINS)}"
        )
    return out


def _rows(rng: random.Random, n: int, day: str, hour: int) -> list[list[str]]:
    emails = _emails(rng, max(8, n // 4))
    items = [(item_id, rng.randrange(100, 10_000)) for item_id in range(1, 51)]
    rows = []
    for _ in range(n):
        item_id, price = rng.choice(items)
        second_of_hour = rng.randrange(3600)
        ts = f"{day}T{hour:02d}:{second_of_hour // 60:02d}:{second_of_hour % 60:02d}"
        rows.append(
            [
                rng.choice(emails),
                str(item_id),
                str(rng.randrange(1, 11)),
                str(price),
                ts,
            ]
        )
    rows.sort(key=lambda r: r[4])  # time-ordered within the file
    return rows


def _write(path: Path, rows: list[list[str]]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="") as fh:
        csv.writer(fh).writerows(rows)
    print(f"wrote {path} ({len(rows)} rows)")


def main() -> None:
    rng = random.Random(20260813)
    day = "2021-03-21"
    for hour, n in ((11, 300), (12, 180), (13, 420)):
        _write(FIXTURES / "purchases" / f"{day}T{hour:02d}.csv", _rows(rng, n, day, hour))
    _write(FIXTURES / "purchases_small.csv", _rows(rng, 40, day, 9))

    good = _rows(rng, 10, day, 10)
    malformed = [
        ["onlythreefields", "1", "2"],  # wrong arity
        ["bad.int@example.com", "notanint", "2", "100", f"{day}T10:00:01"],
        ["bad.ts@example.com", "3", "2", "100", "21/03/2021 10:00"],
        ["bad.qty@example.com", "4", "", "100", f"{day}T10:00:02"],
    ]
    rows = good[:5] + malformed[:2] + good[5:] + malformed[2:]
    _write(FIXTURES / "purchases_malformed.csv", rows)


if __name__ == "__main__":
    main()
