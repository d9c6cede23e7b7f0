#!/usr/bin/env python3
"""Import a slice of the reference sqllogictest corpus into
src/test/resources/sql/ref/ for graft.SqlLogicSpec.

The reference runner (test/sqlite/sqllogic_test_runner.cpp) supports
loops, requires, connection labels, regex expectations etc.; ours
deliberately doesn't. This importer REJECTS any file using those, and
applies only mechanical dialect transforms, recorded in the emitted
header:

  - `//` integer division  -> ` div `
  - `range(N) t(i)`        -> `(SELECT id AS i FROM range(N)) t`
  - trailing `,` before FROM dropped (DuckDB tolerates, Spark doesn't)
  - CREATE TABLE x + INSERT INTO x [cols] VALUES ... merged into ONE
    `CREATE OR REPLACE TEMPORARY VIEW` (hermetic, no warehouse state;
    column-reordered INSERTs are mapped back to schema order)
  - sqlite mode (test/sqlite corpus): every `/` becomes ` div `
    (the reference runs that corpus with SET integer_division=true)

Usage: import_slt.py [--sqlite] [--max-queries N] SRC DEST_NAME
Appends DEST_NAME (with `sqlite:` prefix when --sqlite) to ref/MANIFEST.
"""
import re
import sys
import os

REJECT = ["loop", "endloop", "foreach", "require ", "mode ", "skipif",
          "onlyif", "hash-threshold", "restart", "load ", "sleep ",
          "query error", "<REGEX>", "<FILE>", "con1", "con2", "PRAGMA",
          "ATTACH", "::", "EXCLUDE", "COLUMNS(", "ASOF", "POSITIONAL",
          "SUMMARIZE", "DESCRIBE", "SHOW ", "CREATE INDEX", "SEQUENCE",
          "INSTALL", "EXPORT", "reorder", "UNION BY NAME", "MACRO",
          " TIME", "STRUCT", "MAP(", "LIST", "["]


DIRECTIVE_REJECT = ["loop", "endloop", "foreach", "require ", "mode ",
                    "skipif", "onlyif", "restart",
                    "load ", "sleep ", "query error", "concurrent"]


def reject_reason(text: str, sql_only: str):
    for tok in DIRECTIVE_REJECT:
        for line in text.splitlines():
            if line.strip().startswith(tok):
                return tok
    for tok in REJECT:
        if tok in sql_only:
            return tok
    # ORDER BY inside an aggregate call (duckdb ordered aggregates —
    # Spark has no general equivalent)
    if re.search(r"\w+\s*\([^()]*ORDER\s+BY", sql_only, re.I):
        return "ordered aggregate"
    return None


def transform_sql(sql: str, sqlite_mode: bool) -> str:
    out = sql
    if sqlite_mode:
        # the reference runs this corpus with integer_division=true
        out = re.sub(r"(?<![/*])/(?![/*])", " div ", out)
    else:
        out = out.replace("//", " div ")
    out = re.sub(r"range\((\d+)\)\s+(?:AS\s+)?(\w+)\((\w+)\)",
                 r"(SELECT id AS \3 FROM range(\1)) \2", out)
    out = re.sub(
        r"generate_series\(([^()]*)\)\s+(?:AS\s+)?(\w+)\((\w+)\)",
        r"(SELECT explode(sequence(\1)) AS \3) \2", out)
    out = re.sub(r",(\s*\n\s*FROM\b)", r"\1", out)
    out = re.sub(r",(\s*FROM\b)", r"\1", out)
    # Spark type spellings
    out = re.sub(r"\bVARCHAR\b(?!\s*\()", "STRING", out)
    out = re.sub(r"\bINT64\b", "BIGINT", out)
    out = re.sub(r"\bDOUBLE\s+PRECISION\b", "DOUBLE", out)
    # duckdb COUNT() == COUNT(*)
    out = re.sub(r"\bCOUNT\s*\(\s*\)", "COUNT(*)", out, flags=re.I)
    return out


def parse_records(lines):
    """Yield (kind, header, body_lines, expected_lines) records."""
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            body = []
            i += 1
            while i < n and lines[i].strip() and lines[i].strip() != "----":
                body.append(lines[i])
                i += 1
            exp = []
            if i < n and lines[i].strip() == "----":
                i += 1
                while i < n and lines[i].strip():
                    exp.append(lines[i])
                    i += 1
            yield ("statement", line, body, exp)
        elif line.startswith("query"):
            body = []
            i += 1
            while i < n and lines[i].strip() != "----":
                body.append(lines[i])
                i += 1
            i += 1  # ----
            exp = []
            while i < n and lines[i].strip():
                exp.append(lines[i])
                i += 1
            yield ("query", line, body, exp)
        else:
            i += 1


def merge_tables(records):
    """Fold CREATE TABLE + INSERT ... VALUES runs into one temp view —
    but ONLY for tables whose create + every insert happen before the
    first query record and that are never touched by any other DML
    (later inserts would make hoisted views lie to earlier queries).
    Remaining CREATE TABLEs get a DROP TABLE IF EXISTS so reruns against
    a persistent warehouse stay clean."""
    first_query = next((k for k, (kind, _, _, _) in enumerate(records)
                        if kind == "query"), len(records))
    create_re = re.compile(r"\s*CREATE\s+TABLE\s+(\w+)\s*\(([^;]*)\)\s*$",
                           re.S | re.I)
    insert_re = re.compile(
        r"\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)$",
        re.S | re.I)

    # which tables are safe to fold?
    creates, inserts, touched_late, other_dml = {}, {}, set(), set()
    for idx, (kind, header, body, exp) in enumerate(records):
        if kind != "statement" or "error" in header:
            continue
        sql = "\n".join(body)
        m = create_re.match(sql)
        if m:
            creates.setdefault(m.group(1).lower(), idx)
            continue
        mi = insert_re.match(sql)
        if mi:
            t = mi.group(1).lower()
            inserts.setdefault(t, []).append(idx)
            if idx > first_query:
                touched_late.add(t)
            continue
        for t in re.findall(r"(?:UPDATE|DELETE\s+FROM|ALTER\s+TABLE|"
                            r"INSERT\s+INTO)\s+(\w+)", sql, re.I):
            other_dml.add(t.lower())
    foldable = {t for t in creates
                if creates[t] < first_query and t not in touched_late
                and t not in other_dml and inserts.get(t)}

    any_create_re = re.compile(r"\s*CREATE\s+TABLE\s+(\w+)", re.I)
    schemas, rows, out = {}, {}, []
    for kind, header, body, exp in records:
        sql = "\n".join(body)
        if kind == "statement" and "error" not in header:
            m = create_re.match(sql)
            if m and m.group(1).lower() in foldable:
                t = m.group(1).lower()
                # keep (name, type) so the folded VALUES view casts each
                # column — VALUES alone would re-infer types and lose
                # DECIMAL scales / BIGINT-ness
                schemas[t] = [(c.strip().split()[0],
                               " ".join(c.strip().split()[1:]) or "STRING")
                              for c in m.group(2).split(",") if c.strip()]
                rows[t] = []
                continue
            ma = any_create_re.match(sql)
            if ma:  # kept as a real table: make reruns idempotent
                out.append(("statement", "statement ok",
                            [f"DROP TABLE IF EXISTS {ma.group(1)}"], []))
            mi = insert_re.match(sql)
            if mi and mi.group(1).lower() in schemas:
                t = mi.group(1).lower()
                names = [n for n, _ in schemas[t]]
                cols = ([c.strip() for c in mi.group(2).split(",")]
                        if mi.group(2) else names)
                for tup in re.findall(r"\(([^()]*)\)", mi.group(3)):
                    vals = [v.strip() for v in tup.split(",")]
                    rows[t].append(dict(zip(cols, vals)))
                continue
        out.append((kind, header, body, exp))
    views = []
    for t, cols in schemas.items():
        if not rows[t]:
            continue
        names = [n for n, _ in cols]
        tuples = ", ".join(
            "(" + ", ".join(r.get(c, "NULL") for c in names) + ")"
            for r in rows[t])
        casted = ", ".join(f"CAST({n} AS {ty}) AS {n}" for n, ty in cols)
        views.append(
            f"statement ok\nCREATE OR REPLACE TEMPORARY VIEW {t} AS "
            f"SELECT {casted} FROM (VALUES {tuples}) AS {t}({', '.join(names)})\n")
    return views, out


def main():
    args = sys.argv[1:]
    sqlite_mode = "--sqlite" in args
    if sqlite_mode:
        args.remove("--sqlite")
    max_q = None
    if "--max-queries" in args:
        k = args.index("--max-queries")
        max_q = int(args[k + 1])
        del args[k:k + 2]
    src, dest_name = args
    text = open(src).read()
    records = list(parse_records(text.splitlines()))
    sql_only = "\n".join("\n".join(b) for _, _, b, _ in records)
    r = reject_reason(text, sql_only)
    if r:
        print(f"REJECT {src}: uses '{r}'")
        sys.exit(2)
    views, rest = merge_tables(records)
    dest_dir = os.path.join(os.path.dirname(__file__), "..",
                            "src", "test", "resources", "sql", "ref")
    os.makedirs(dest_dir, exist_ok=True)
    out = [f"# imported from reference {src.split('/reference/')[-1]}",
           "# by tools/import_slt.py"
           + (" (sqlite mode: / -> div, floats hash as rounded BIGINT)"
              if sqlite_mode else ""),
           "# transforms: // -> div; range() aliasing; trailing commas;"
           " CREATE TABLE+INSERT merged into temp views", ""]
    out.extend(transform_sql(v, sqlite_mode) for v in views)
    nq = 0
    for kind, header, body, exp in rest:
        sql = transform_sql("\n".join(body), sqlite_mode)
        if kind == "query":
            nq += 1
            if max_q and nq > max_q:
                break
        out.append(header)
        out.append(sql)
        if kind == "query" or exp:
            out.append("----")
            out.extend(exp)
        out.append("")
    open(os.path.join(dest_dir, dest_name), "w").write("\n".join(out) + "\n")
    manifest = os.path.join(dest_dir, "MANIFEST")
    entry = ("sqlite:" if sqlite_mode else "") + dest_name
    lines = []
    if os.path.exists(manifest):
        lines = [l for l in open(manifest).read().splitlines() if l.strip()]
    if entry not in lines:
        lines.append(entry)
    open(manifest, "w").write("\n".join(lines) + "\n")
    print(f"OK {dest_name}: {nq} queries" + (" (sqlite)" if sqlite_mode else ""))


if __name__ == "__main__":
    main()
