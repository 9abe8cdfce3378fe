"""Freeze fixture oracles: materialize the Spark output of the
md5-seeded-backend queries (informers_spark.queries.FIXTURE_QUERIES) at
the driver's correctness-gate scale (sf0.01) into committed parquet
files under tests/fixtures/. The driver's DuckDB oracle then reads the
fixture (`SELECT * FROM '<fixture>.parquet'`) — pinning the values the
same way the reference pins golden model outputs
(/root/reference/test/pipeline_test.rb:115-121).

Regenerate ONLY on an intentional semantics change:
    python tools/freeze_fixtures.py [sf_dir]
tests/test_frozen_fixtures.py asserts the live queries still reproduce
the frozen values, so accidental drift fails CI.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from informers_spark.queries import FIXTURE_DIR, FIXTURE_QUERIES, QUERIES
    from informers_spark.session import get_spark

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    spark = get_spark(app_name="freeze_fixtures", cores=8)
    for name in FIXTURE_QUERIES:
        pdf = QUERIES[name](spark, sf_dir).toPandas()
        path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"froze {name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
