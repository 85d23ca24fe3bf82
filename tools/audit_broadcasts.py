"""Fleet broadcast audit CLI — see adb_south_caucasus_etl_spark/plans/audit.py
for the classification rules. The pytest gate lives in
tests/test_plan_audit.py (allowlist BROADCAST_DATA_SCALE_OK); this script is
the ad-hoc sweep for triage.

Usage: python tools/audit_broadcasts.py [sf_dir] [names...]
Prints one line per data-scale hint; exit 1 if any are found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from adb_south_caucasus_etl_spark.plans.audit import data_scale_broadcasts
    from adb_south_caucasus_etl_spark.session import get_spark
    from adb_south_caucasus_etl_spark.workload import WORKLOAD

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(WORKLOAD)
    spark = get_spark()
    bad = 0
    for name in names:
        try:
            df = WORKLOAD[name].fn(spark, sf_dir)
        except Exception as e:  # build-time failure is its own signal
            print(f"ERR  {name}: {e}")
            bad += 1
            continue
        for reason in data_scale_broadcasts(df):
            print(f"DATA-SCALE  {name}: {reason}")
            bad += 1
    print(f"done: {len(names)} queries, {bad} data-scale broadcast hints")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
