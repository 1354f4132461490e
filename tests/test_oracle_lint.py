"""Catalog-wide structural lint over live AND staged entries — the
round-6 mirror/driver lesson (VERDICT item 2) as a permanent gate:
every cross-engine trap this repo has been burned by becomes a static
check here, so a new entry cannot reintroduce one and pass CI.

Covers:
- dialect traps in the oracle SQL (bare FILTER clauses, WITH
  ORDINALITY, md5_number endianness, float-quotient -> BIGINT casts,
  unvetted POW);
- oracle OUTPUT schema (no HUGEINT/UHUGEINT — the round-6 root cause
  of the 8 r05 reds; no list/struct/map/blob — the q29 canonicalizer
  crash);
- Spark OUTPUT schema (no array/map/struct/binary/timestamp — only
  scalar types and DATE survive the driver comparator).
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

from airflow_scraping_etl_tutorial_spark.plans.registry import STAGED_MODULES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    os.environ["SPARK_GRAFT_EXTRA_MODULES"] = ",".join(STAGED_MODULES)
    try:
        from airflow_scraping_etl_tutorial_spark.plans import all_queries

        yield all_queries()
    finally:
        os.environ.pop("SPARK_GRAFT_EXTRA_MODULES", None)


@pytest.fixture(scope="module")
def duck():
    from airflow_scraping_etl_tutorial_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


# q35 exercises POW deliberately AS the math-function surface; its
# ROUND(POW(int, 2), 2) output is exact and has been driver-attested
# green since round 1. Everything else must write x*x (q98 lesson:
# DuckDB POW differs from Java's in the last ulp).
POW_ALLOWED = {"q35_math_functions"}

# DuckDB CAST(DOUBLE AS BIGINT) ROUNDS where Spark truncates; a float
# quotient cast to BIGINT is the q110 trap. Truncating integer `//` or
# explicit FLOOR must be used instead. The earlier regex guard used
# [^()]* on both sides of the '/', so any CAST with nested parens —
# e.g. CAST(SUM(a)/COUNT(*) AS BIGINT), the realistic offender shape —
# silently never matched (round-6 ADVICE). This scanner walks balanced
# parens instead.


def _strip_calls(body: str, names: tuple[str, ...]) -> str:
    """Remove balanced `name(...)` spans: a '/' inside FLOOR/CEIL is
    already integral before the cast, so it is not the trap."""
    pat = re.compile(r"(?:%s)\s*\(" % "|".join(names), re.I)
    while True:
        m = pat.search(body)
        if not m:
            return body
        depth, i = 1, m.end()
        while i < len(body) and depth:
            if body[i] == "(":
                depth += 1
            elif body[i] == ")":
                depth -= 1
            i += 1
        if depth:  # unbalanced inner call — keep text, let caller flag
            return body
        body = body[: m.start()] + body[i:]


def _float_quotient_bigint_casts(sql: str) -> list[str]:
    """Every CAST(... AS BIGINT) body (balanced-paren extent) whose
    remaining text after stripping FLOOR/CEIL spans and integer `//`
    still contains a float '/'."""
    hits = []
    for m in re.finditer(r"CAST\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        if depth:
            hits.append(sql[m.start() : m.start() + 80] + " …UNBALANCED")
            continue
        body = sql[m.end() : i - 1]
        if not re.search(r"AS\s+BIGINT\s*$", body, re.I):
            continue
        residue = _strip_calls(body, ("FLOOR", "CEIL")).replace("//", "")
        if "/" in residue:
            hits.append(" ".join(body.split())[:120])
    return hits


def test_no_bare_filter_clause(specs):
    bad = [
        n
        for n, s in specs.items()
        if s.oracle and re.search(r"\)\s*FILTER\s*\(", s.oracle, re.I)
    ]
    assert not bad, f"bare FILTER clause (use CASE WHEN — q155 lesson): {bad}"


def test_no_known_unsupported_or_endian_constructs(specs):
    for pat, why in [
        (r"WITH\s+ORDINALITY", "DuckDB lacks WITH ORDINALITY"),
        (r"md5_number", "md5_number_* is little-endian (use '0x'||SUBSTR cast)"),
    ]:
        bad = [
            n for n, s in specs.items() if s.oracle and re.search(pat, s.oracle, re.I)
        ]
        assert not bad, f"{why}: {bad}"


def test_pow_only_in_vetted_entries(specs):
    bad = [
        n
        for n, s in specs.items()
        if s.oracle
        and re.search(r"\bPOW\s*\(", s.oracle, re.I)
        and n not in POW_ALLOWED
    ]
    assert not bad, f"POW differs from Java in the last ulp — write x*x: {bad}"


# Audited hits of the balanced-paren scanner where the cast body is
# integral by construction despite a '/' in the residue: q98's '/'
# sits in a CASE WHEN *condition* (both value branches are ±FLOOR),
# q187's quotient is ROUND(..., 0)-ed to an integer before the cast
# (and both are driver-attested strict-green). A NEW hit must be
# audited the same way before it may join this set.
_QUOTIENT_CAST_ALLOWED = {
    "q98_embedding_int8_quantization",
    "q187_neyman_allocation",
}


def test_no_float_quotient_bigint_cast(specs):
    bad = {
        n: hits
        for n, s in specs.items()
        if s.oracle
        and n not in _QUOTIENT_CAST_ALLOWED
        and (hits := _float_quotient_bigint_casts(s.oracle))
    }
    assert not bad, (
        "CAST(a/b AS BIGINT) rounds in DuckDB but truncates in Spark "
        f"(q110 lesson — use // on ints or FLOOR on doubles): {bad}"
    )


def test_oracle_output_schemas_are_scalar_and_hugeint_free(specs, duck):
    offenders: dict[str, dict[str, str]] = {}
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        rel = duck.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
        tys = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        bad = {
            c: t
            for c, t in tys.items()
            if "HUGEINT" in t
            or t.endswith("[]")
            or t.startswith(("STRUCT", "MAP", "BLOB", "UNION"))
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle outputs must be scalar and HUGEINT-free (round-6 root "
        f"cause / q29 canonicalizer crash): {offenders}"
    )


# Shadow sites where the alias is numerically identical to the input
# column it shadows (a bigint/coalesce re-cast), so capture cannot
# change values. Audited individually in round 6.
_SHADOW_ALLOWED = {
    ("operators/cluster.py", "u"),  # u/v swap — plain refs bind to input
    ("plans/llm_ops10.py", "n_sessions"),
    ("plans/llm_ops4.py", "n_docs"),
    ("plans/llm_ops5.py", "n_wedges"),
    ("plans/llm_ops6.py", "degree"),
    ("plans/llm_ops7.py", "n_ab"),
    ("plans/llm_ops9.py", "decay_num"),
    ("plans/relational2.py", "cohort_size"),
    ("plans/relational2.py", "n_active_users"),
    ("plans/relational2.py", "n_days"),
}


def test_no_new_lateral_alias_shadows():
    """The q98 sf0.1 lesson: an output alias that shadows an input
    column referenced by a LATER expression in the same select can be
    captured by Spark 4's lateral column alias resolution (observed
    inside higher-order-function lambdas), silently diverging from the
    oracle. Any new shadow site must be audited and added to the
    allowlist — or better, split into two projections."""
    import glob
    import os

    pkg = os.path.join(
        os.path.dirname(__file__), "..", "airflow_scraping_etl_tutorial_spark"
    )
    found = set()
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        src = open(path).read()
        rel = os.path.relpath(path, pkg).replace(os.sep, "/")
        for m in re.finditer(r"\.select\(", src):
            # scan to the MATCHING paren over the whole remainder — the
            # earlier 2500-char cap silently skipped exactly the large
            # generated projections where the q98-class capture bug is
            # most likely (round-6 ADVICE)
            chunk = src[m.end() :]
            depth, end = 1, None
            for i, ch in enumerate(chunk):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            assert end is not None, (
                f"unbalanced .select( parens while scanning {rel} at "
                f"offset {m.start()} — fix the scanner, don't skip"
            )
            body = chunk[:end]
            for mm in re.finditer(r"\.alias\(\"(\w+)\"\)", body):
                name = mm.group(1)
                if re.search(rf"F\.col\(\"{name}\"\)", body[mm.start() :]):
                    found.add((rel, name))
    new = found - _SHADOW_ALLOWED
    assert not new, (
        "new lateral-alias shadow site(s) — split the projection or "
        f"audit + allowlist: {sorted(new)}"
    )


def test_spark_output_schemas_are_scalar(specs, spark):
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, spec in specs.items():
        dts = spec.fn(spark, SF_DIR).dtypes
        bad = [
            (c, t)
            for c, t in dts
            if t.startswith(("array", "map", "struct", "binary", "timestamp"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "Spark outputs must be scalar (timestamps project as DATE/"
        f"string/epoch — NOTES doctrine): {offenders}"
    )
