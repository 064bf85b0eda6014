"""Generate the mechanical operator→query→driver-row→test index
(round-4 verdict item 8): one row per ``queries()`` entry with

* ``oracle`` — whether an ``oracle_sql()`` SQL twin exists (oracle-backed
  entries are value-hash-compared against DuckDB by the driver AND by the
  pytest sweep every session; rows-only entries have separate goldens),
* ``driver rounds`` — every round whose ``CORRECTNESS_r*.json`` holds an
  all-green row for the query (empty = never driver-sampled yet; the
  50-slot window rotates, see the rotation note in
  ``pipelines/queries.py``),
* ``tests`` — the pytest files that mention the query or its underlying
  stage function (every query is additionally swept by
  ``test_queries_oracle.py``, not repeated per row).

Writes ``COVERAGE_TABLE.md`` at the repo root and prints summary counts.
Usage: ``PYTHONPATH=/root/repo python tools/coverage_table.py``.
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from feature_extraction_ray.pipelines.queries import ORACLE_SQL, QUERIES


def driver_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            if row.get("rows_match") and row.get("schema_match", True) \
                    and row.get("hash_match", True):
                out.setdefault(name, []).append(rnd)
    return out


def _stage_imports(fn) -> list[str]:
    """Stage/function names a query imports (``from ..stages.x import y``
    inside its body) — the hook connecting a query to the dedicated
    stage tests that cover its kernel."""
    import inspect
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return []
    # one level of same-module _helper resolution (queries that delegate
    # to a shared _impl carry their imports there)
    mod = inspect.getmodule(fn)
    for helper in set(re.findall(r"\b(_\w+)\(", src)):
        h = getattr(mod, helper, None)
        if callable(h):
            try:
                src += inspect.getsource(h)
            except (OSError, TypeError):
                pass
    names: list[str] = []
    pkg = r"from \.\.(?:stages|functions|sources|state|pipelines)\.\w+"
    for m in re.finditer(pkg + r" import \(([^)]+)\)", src):
        names += [n.strip() for n in m.group(1).split(",") if n.strip()]
    for m in re.finditer(pkg + r" import ([^\n(]+)", src):
        names += [n.strip() for n in m.group(1).split(",") if n.strip()]
    # docstring citations of the form stages/<mod>.<fn>
    names += [m.group(1) for m in
              re.finditer(r"(?:stages|functions)/\w+\.(\w+)", src)]
    # module-top-level imports the query's code actually references
    for used in set(re.findall(r"\b(\w+)\(", src)):
        obj = getattr(mod, used, None)
        om = getattr(obj, "__module__", "")
        if callable(obj) and om.startswith("feature_extraction_ray.") \
                and not om.endswith(".queries"):
            names.append(used)
    return [n for n in names if len(n) > 3]


def test_files_by_query() -> dict[str, list[str]]:
    """Pytest files mentioning each query name OR a stage function the
    query imports (word-boundary match)."""
    files = sorted(glob.glob(os.path.join(ROOT, "tests", "test_*.py")))
    contents = {os.path.basename(p): open(p).read() for p in files}
    contents.pop("test_queries_oracle.py", None)  # covers every query
    out: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        terms = {name, *_stage_imports(fn)}
        pats = [re.compile(rf"\b{re.escape(t)}\b") for t in terms]
        out[name] = [f for f, body in contents.items()
                     if any(p.search(body) for p in pats)]
    return out


def main() -> None:
    rounds = driver_rounds()
    tests = test_files_by_query()
    lines = [
        "# Coverage table (generated — do not edit)",
        "",
        "Regenerate with `PYTHONPATH=/root/repo python "
        "tools/coverage_table.py`. Every query is additionally verified "
        "by the parametrized `tests/test_queries_oracle.py` sweep "
        "(oracle-backed: full value compare vs DuckDB at sf0.001; "
        "rows-only: non-empty gate) every session; the `tests` column "
        "lists only ADDITIONAL dedicated test files.",
        "",
        "| query | oracle | driver-green rounds | dedicated tests |",
        "|---|---|---|---|",
    ]
    n_oracle = n_driver = 0
    for name in sorted(QUERIES):
        has_oracle = name in ORACLE_SQL
        n_oracle += has_oracle
        rs = rounds.get(name, [])
        n_driver += bool(rs)
        lines.append("| {} | {} | {} | {} |".format(
            name,
            "sql" if has_oracle else "rows-only",
            ", ".join(f"r{r}" for r in rs) or "—",
            ", ".join(tests[name]) or "—"))
    never = [n for n in sorted(QUERIES)
             if n in ORACLE_SQL and n not in rounds]
    lines += [
        "",
        f"**Totals:** {len(QUERIES)} queries; {n_oracle} oracle-backed; "
        f"{len(QUERIES) - n_oracle} rows-only; {n_driver} with at least "
        f"one driver-green CORRECTNESS row; {len(never)} oracle-backed "
        "entries still awaiting their first driver row (each verified "
        "by the pytest sweep every session).",
        "",
    ]
    out_path = os.path.join(ROOT, "COVERAGE_TABLE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {len(QUERIES)} queries, "
          f"{n_oracle} oracle-backed, {n_driver} driver-green, "
          f"{len(never)} oracle-backed never driver-sampled")


if __name__ == "__main__":
    main()
