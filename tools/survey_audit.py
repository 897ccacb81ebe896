#!/usr/bin/env python3
"""SURVEY.md §2 <-> code cross-check (round-13 verdict ask #3).

The operator inventory is 300+ components across 700+ SURVEY lines; every
judge/builder audit so far has hand-counted it. This tool machine-checks
both directions:

  Direction 1 (SURVEY -> code): every §2 table row that declares an
    engine-op name must resolve — each row passes if at least one of its
    backticked names is (a) a `SparkEntry.queries` key (extracted from the
    `"name" -> ((` lambda definition sites under src/main/scala/graft/),
    or (b) a main-source object/class (spec-gated components such as
    ScaleJoins / StreamingAggs / TrainingDataPrep) that at least one test
    suite references. Rows whose op-name cell is a non-op marker ("—",
    "(connector-internal)") are skipped.

  Direction 2 (code -> SURVEY): every queries key defined in source must
    appear backticked somewhere in §2.

  Bonus gate: every queries key must also have an oracleSql entry, except
    keys in NO_ORACLE (adjudicated rows-only queries).

Usage: python3 tools/survey_audit.py [repo_root]
Exit 0 and a "0 orphans" summary on success; exit 1 with named orphans
otherwise. Commit the output per round (SURVEY_AUDIT.txt).
"""
import pathlib
import re
import sys

NO_ORACLE = {"media_prep"}  # binary codec kernels; adjudicated in VERDICT r11-13
NON_OP_CELLS = {"—", "-", "(connector-internal)"}

# §2-A non-query unit names -> the main-source class that implements them
# (mirrors the VERDICT §2-A "Where" column; these are spec-gated, not
# oracle-gated, so they carry no SparkEntry.queries key).
UNIT_ALIASES = {
    "sink_archive_raw": "Lifecycle",
    "check_table_exists": "Sink",
    "sink_append_batched": "Sink",
    "route_file_outcome": "Lifecycle",
    "ack_source": "StreamIngest",
    "stream_ingest": "StreamIngest",
}


def survey_section2(root: pathlib.Path) -> str:
    text = (root / "SURVEY.md").read_text()
    m = re.search(r"^## 2\. .*?(?=^## \d)", text, re.M | re.S)
    if not m:
        sys.exit("cannot locate SURVEY.md §2")
    return m.group(0)


def survey_rows(sec2: str):
    """Yield (line_no, cell) for every op-name cell of every §2 table row."""
    col_idx = None
    for i, line in enumerate(sec2.splitlines(), 1):
        if not line.lstrip().startswith("|"):
            col_idx = None
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        low = [c.lower() for c in cells]
        if "engine op name" in low:
            col_idx = low.index("engine op name")
            continue
        if col_idx is None or set(line) <= {"|", "-", " ", ":"}:
            continue  # no op-name column in this table, or separator row
        if col_idx < len(cells):
            yield i, cells[col_idx]


def source_query_keys(root: pathlib.Path):
    keys = set()
    for f in (root / "src/main/scala/graft").rglob("*.scala"):
        keys |= set(re.findall(r'"([a-z0-9_]+)"\s*->\s*\(\(', f.read_text()))
    return keys


def source_oracle_keys(root: pathlib.Path):
    """Keys of oracle-map entries: `"name" ->` NOT followed by a query
    lambda `((`. Oracle values take several shapes (triple-quoted literal,
    interpolated, `(pairCte + ...)` concatenation), so the negative test on
    the lambda shape is the robust discriminator. Scanned over ops/ only
    (where the packs' oracles maps live)."""
    keys = set()
    for f in (root / "src/main/scala/graft/ops").rglob("*.scala"):
        # the whitespace must live INSIDE the lookahead (with `\s*` outside,
        # backtracking makes the lookahead vacuous), and the exclusion must
        # name the exact lambda shape `((s, d)` — oracle values may ALSO
        # open with a double paren (`((s"""...""" + ...).stripMargin)`)
        keys |= set(re.findall(
            r'"([a-z0-9_]+)"\s*->(?!\s*\(\(s, d\))', f.read_text()))
    return keys


def main() -> None:
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    sec2 = survey_section2(root)
    qkeys = source_query_keys(root)
    okeys = source_oracle_keys(root)
    main_src = "\n".join(f.read_text()
                         for f in (root / "src/main/scala/graft").rglob("*.scala"))
    test_src = "\n".join(f.read_text()
                         for f in (root / "src/test/scala/graft").rglob("*.scala"))

    def is_class_ref(tok: str) -> bool:
        cls = tok.split(".")[0]
        if not re.match(r"^[A-Z][A-Za-z0-9]*$", cls):
            return False
        if cls.endswith("Spec"):  # test-plane breadth rows (e.g. FormatsSpec)
            return bool(re.search(rf"\bclass {cls}\b", test_src))
        defined = re.search(rf"\b(object|class|trait) {cls}\b", main_src)
        tested = cls in test_src
        return bool(defined and tested)

    def resolves(tok: str) -> bool:
        if tok in qkeys or is_class_ref(tok):
            return True
        if tok in UNIT_ALIASES:  # §2-A spec-gated units
            return is_class_ref(UNIT_ALIASES[tok])
        if tok.startswith("graft_"):  # registered native-function names
            return f'"{tok}"' in main_src
        return False

    # Direction 1: SURVEY rows -> code
    rows = list(survey_rows(sec2))
    unresolved_rows = []
    for line_no, cell in rows:
        if cell in NON_OP_CELLS or cell.startswith("covered by"):
            continue
        toks = re.findall(r"`([^`]+)`", cell)
        if not toks:
            continue  # prose cell without a declared name
        ok = any(resolves(t) for t in toks)
        if not ok:
            unresolved_rows.append((line_no, cell))

    # Direction 2: code keys -> SURVEY
    missing_in_survey = sorted(k for k in qkeys if f"`{k}`" not in sec2)

    # Oracle gate
    missing_oracle = sorted(qkeys - okeys - NO_ORACLE)
    stale_no_oracle = sorted(NO_ORACLE - qkeys)

    n_cells = sum(1 for _, c in rows if c not in NON_OP_CELLS
                  and not c.startswith("covered by") and re.search(r"`", c))
    print(f"[survey_audit] survey op rows with declared names: {n_cells}")
    print(f"[survey_audit] source query keys: {len(qkeys)}")
    print(f"[survey_audit] source oracle keys: {len(okeys & qkeys)} "
          f"(+{len(NO_ORACLE & qkeys)} adjudicated no-oracle)")

    failed = False
    if unresolved_rows:
        failed = True
        print(f"ORPHANS survey->code ({len(unresolved_rows)} rows):")
        for line_no, cell in unresolved_rows:
            print(f"  SURVEY.md §2 line {line_no}: {cell[:100]}")
    if missing_in_survey:
        failed = True
        print(f"ORPHANS code->survey ({len(missing_in_survey)} keys):")
        for k in missing_in_survey:
            print(f"  {k}")
    if missing_oracle:
        failed = True
        print(f"QUERIES WITHOUT ORACLE ({len(missing_oracle)}):")
        for k in missing_oracle:
            print(f"  {k}")
    if stale_no_oracle:
        failed = True
        print(f"STALE NO_ORACLE entries: {stale_no_oracle}")
    if not failed:
        print("[survey_audit] 0 orphans in both directions; "
              "oracle coverage complete")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
