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

Round 15 retired the last fixture guard (requireSimpleCaseFixture): the
engine's canonical fold is now the Unicode SIMPLE lowercase
(graft.functions.simple_lower — context- and locale-free), which DuckDB's
lower() computes identically modulo three stale-table code points the
twins pre-replace (SparkEntry.sqlFold). This fixture therefore DELIBERATELY
carries the formerly-rejected hazard characters — U+0130 (İ), medial AND
word-final U+03A3 (Σ), and the three utf8proc-stale cps U+A7C7/C9/F5 —
and the query list covers the entire lowercasing-twin family, not just
the byte/code-unit eight.

Usage: python3 tools/nonascii_check.py [srcDir] (default /root/testdata/sf0.001)
"""
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

QUERIES = ",".join([
    # the byte/code-unit eight (round-14 ASCII-guard retirement)
    "embed_corpus", "embed_knn", "simhash_pairs", "winnow_pairs",
    "bpe_tokens", "bpe_encode", "multimodal_knn", "frame_hist",
    # the lowercasing family (round-15 case-guard retirement)
    "batch_near_dup", "bigram_topk", "bm25_index_topk", "bm25_topk",
    "budget_select", "contamination", "curation_pipeline", "dedup_clusters",
    "dedup_jaccard_pairs", "dedup_minhash", "dedup_near_keep",
    "dedup_span_cut", "doc_chunks", "doc_dup_spans", "doc_gopher",
    "doc_keywords", "doc_len_hist", "doc_len_quantiles",
    "doc_len_quantiles_approx", "doc_patterns", "doc_perplexity",
    "doc_quality", "doc_repetition", "edit_sim_pairs", "hybrid_rrf",
    "hybrid_weighted", "index_near_keep", "index_span_cut",
    "jaccard_join_pairs", "lang_id", "lang_len_quantiles",
    "normalize_dedup", "pack_batches", "pair_mining", "quality_tiers",
    "source_mix", "split_leakfree", "text_stats",
    "top_docs_per_lang", "vocab_overlap", "vocab_size", "vocab_topk",
    "weighted_sample",
])

SPICE = [
    "caf\u00e9 na\u00efve fa\u00e7ade \u00fcber stra\u00dfe",   # latin accents + sharp-s
    "\u4e2d\u6587 \u6587\u672c \u5904\u7406 \u7ba1\u9053",   # CJK
    "emoji \U0001f44d test \U0001f680 corpus \U0001f44d\U0001f44d",  # astral (surrogate pairs)
    "combining e\u0301 mark a\u0300 grave",                    # combining marks
    "private \ue001 use \ue002 block",     # U+E000 block (UTF-16 order stress)
    "mixed \u00e9\u4e2d\U0001f44d soup \ue003",              # everything at once
    # round-15 case-fold hazards: U+0130, medial+final+standalone Σ, ς,
    # and the three cps where utf8proc's tables lag Java's (sqlFold)
    "\u0130stanbul \u0130\u0130 I\u0131",                     # İ unconditional
    "\u03a3\u039f\u03a6\u039f\u03a3 \u03c3o\u03c6o\u03c2 \u03a4\u0395\u039b\u039f\u03a3 \u03a3 \u0391\u03a3",  # Σ all positions
    "stale \ua7c7\ua7c8 \ua7c9\ua7ca \ua7f5\ua7f6 maps",   # utf8proc-stale cps
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
    nspice = len(SPICE)
    con.execute(f"""
        COPY (
          WITH spice(i, s) AS (VALUES {spice_vals}),
          base AS (
            SELECT doc_id,
              CASE WHEN doc_id % 4 = 3 THEN text
                   ELSE (SELECT s FROM spice WHERE i = doc_id % {nspice}) || ' ' || text
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
