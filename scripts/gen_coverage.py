"""Regenerate the §2 query table in COVERAGE.md from the live registry."""
import re
import sys

sys.path.insert(0, "/root/repo")
from wcdimportbot_spark.plans.benchmark_queries import QUERIES

rows = ["| query | SURVEY ids | oracle | description |", "|---|---|---|---|"]
for name, spec in QUERIES.items():
    oracle = "DuckDB" if spec.oracle else "rows-only"
    rows.append(f"| `{name}` | {spec.survey} | {oracle} | {spec.description} |")
table = "\n".join(rows)

path = "/root/repo/COVERAGE.md"
src = open(path).read()
start = src.index("| query | SURVEY ids |")
end = src.index("\n## 3.")
open(path, "w").write(src[:start] + table + src[end:])
print(f"regenerated: {len(QUERIES)} queries")
