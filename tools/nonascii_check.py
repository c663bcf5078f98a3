#!/usr/bin/env python3
"""Encoding-faithfulness check for the formerly ASCII-guarded oracles.

Round 14 retired `requireAsciiFixture`: the winnow/simhash/embed/bpe/
multimodal/frame_hist DuckDB twins now emulate the kernels' exact UTF-8
byte / UTF-16 code-unit views (SparkEntry.sqlUtf8Bytes / sqlUtf16Units).
This tool proves that on a deliberately non-ASCII fixture:

 1. builds a fixture dir: the sf0.001 tables, with documents REWRITTEN so
    most texts carry accents, CJK, astral emoji (surrogate pairs in
    UTF-16), combining marks, and a private-use U+E000-block char (the
    UTF-16-vs-code-point ORDER BY stress case), plus duplicated texts so
    the pair queries emit non-empty output;
 2. runs `graft.Verify` restricted to the eight queries;
 3. replays the oracle SQL in DuckDB via tools/oracle_check.py.

Known residual (not checked here, but GUARDED in the engine): DuckDB
lower() applies utf8proc's code-point-wise mapping where Java applies full
case mapping — divergent only on U+0130 and word-final U+03A3 under
Locale.ROOT. SparkEntry.requireSimpleCaseFixture fails loudly on a fixture
containing either (pinned by SparkEntrySpec); this fixture uses
simple-mapping characters, as real corpora overwhelmingly do.

Usage: python3 tools/nonascii_check.py [srcDir] (default /root/testdata/sf0.001)
"""
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

QUERIES = "embed_corpus,embed_knn,simhash_pairs,winnow_pairs,bpe_tokens,bpe_encode,multimodal_knn,frame_hist"

SPICE = [
    "caf\u00e9 na\u00efve fa\u00e7ade \u00fcber stra\u00dfe",   # latin accents + sharp-s
    "\u4e2d\u6587 \u6587\u672c \u5904\u7406 \u7ba1\u9053",   # CJK
    "emoji \U0001f44d test \U0001f680 corpus \U0001f44d\U0001f44d",  # astral (surrogate pairs)
    "combining e\u0301 mark a\u0300 grave",                    # combining marks
    "private \ue001 use \ue002 block",     # U+E000 block (UTF-16 order stress)
    "mixed \u00e9\u4e2d\U0001f44d soup \ue003",              # everything at once
]


def build_fixture(src: Path, dst: Path) -> None:
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    for p in src.glob("*.parquet"):
        if p.name != "documents.parquet":
            shutil.copy(p, dst / p.name)
    con = duckdb.connect()
    # sprinkle non-ASCII into 3 of every 4 docs (prefix keeps texts
    # distinct where they were distinct); duplicate six docs verbatim at
    # high ids so winnow/simhash mine non-empty pair sets over non-ASCII
    spice_vals = ", ".join("(%d, '%s')" % (i, s) for i, s in enumerate(SPICE))
    con.execute(f"""
        COPY (
          WITH spice(i, s) AS (VALUES {spice_vals}),
          base AS (
            SELECT doc_id,
              CASE WHEN doc_id % 4 = 3 THEN text
                   ELSE (SELECT s FROM spice WHERE i = doc_id % 6) || ' ' || text
              END AS text,
              lang, source FROM read_parquet('{src}/documents.parquet')
          ),
          dups AS (
            SELECT doc_id + 100000 AS doc_id, text, lang, source
            FROM base WHERE doc_id < 6
          ),
          allrows AS (SELECT * FROM base UNION ALL SELECT * FROM dups)
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM allrows ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    n, nonascii = con.execute(
        f"""SELECT count(*), count(*) FILTER (regexp_matches(text, '[^\\x01-\\x7F]'))
            FROM read_parquet('{dst}/documents.parquet')""").fetchone()
    print(f"fixture: {n} docs, {nonascii} non-ASCII at {dst}")
    assert nonascii > n // 2, "fixture must actually be non-ASCII"


def main() -> int:
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    fix = Path("/tmp/graft_nonascii_fixture")
    out = Path("/tmp/graft_nonascii_out")
    build_fixture(src, fix)
    if out.exists():
        shutil.rmtree(out)
    subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {fix} {out} {QUERIES}'],
        cwd=Path(__file__).resolve().parent.parent, check=True)
    return subprocess.call(
        [sys.executable, str(Path(__file__).with_name("oracle_check.py")),
         str(fix), str(out)])


if __name__ == "__main__":
    sys.exit(main())
