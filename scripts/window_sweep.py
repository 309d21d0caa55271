"""Sweep every catalog query's physical plan for Window nodes and
print their partition specs — calibration data for the low-cardinality
window gate in tests/test_plan_quality.py."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_start_spark import cache
from flink_start_spark.plans import QUERIES
from flink_start_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("window-sweep")
for name in sorted(QUERIES):
    try:
        df = QUERIES[name].spark(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        print(f"{name}: ERROR {e}")
        continue
    finally:
        cache.release()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-*: ")
        m = re.match(r"(Window|WindowGroupLimit|RunningWindowFunction)\s+(.*)", s)
        if m:
            kind = m.group(1)
            specs = re.findall(r"\[([^\]]*)\]", m.group(2))
            print(f"{name}: {kind} specs={specs[:4]}")
spark.stop()
