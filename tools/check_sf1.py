#!/usr/bin/env python3
"""sf1 correctness certification for the scale-trend operator set.

The scale story (scale_trend.json) measures WALL TIME at the
synthesized sf1 (10x sf0.1, see graft.tools.ScaleTrend); this script
closes the loop the round-10 verdict asked for: run the DuckDB oracle
at sf1 too, so the headline operators are rows+schema+hash-certified at
the largest scale the harness reaches, not just timed there.

Usage:
  python3 tools/check_sf1.py [--skip-dump]

Synthesizes sf1 if absent (via a tiny Spark run), dumps the
oracle-checked scale-trend entries with graft.tools.DumpOne, compares
each against DuckDB over the same sf1 parquet, and writes
CORRECTNESS_SF1.json.
"""
import json
import math
import subprocess
import sys

import duckdb
import pandas as pd

SF1_DIR = "/tmp/graft_synth_sf1"
OUT_DIR = "/tmp/graft_verify_sf1"
# synthesized sf1 carries exactly the tables the scale-trend entries
# touch (ScaleTrend.synthesizeSf1)
TABLES = ["documents", "embeddings", "orders", "lineitem"]
# the oracle-checked subset of ScaleTrend's headline list (the rest of
# that list is the justified no_oracle set, spec-gated in sbt test)
QUERIES = [
    "x3_jaccard_pairs", "x56_dedup_clusters_star", "x57_dup_ngram_coverage",
    "x58_remove_dup_ngrams", "x62_indexed_incremental", "x66_image_hash_pairs",
    "x67_seed_distance", "x68_incremental_clusters", "q40_recursive_spine",
    "x71_audio_features", "x72_url_curation", "x73_shuffle_shards",
    "x74_zorder_layout", "x77_domain_quota", "x78_crawl_pipeline",
    "x80_video_meta", "x81_quality_score", "x83_psl_domains",
    "x84_video_frames", "x85_source_epochs", "x86_quality_calibration",
    "x87_latest_per_url", "x88_crawl_diff", "x89_unicode_nfc",
    "x90_idn_domains", "x92_bpe_bytes_roundtrip",
    "x93_bpe_full_fidelity", "x94_bpe_mapside", "x95_pack_token_budget",
    "x96_materialize_sequences", "x97_sequence_contamination",
    "x98_separator_sequences", "x99_token_frequency",
    "x100_fim_transform", "x103_sft_loss_mask",
    "x105_preference_pairs", "x106_tokenizer_fertility",
    "x107_length_batches", "x108_temperature_sample",
    "x109_best_of_n", "x110_resume_shuffle",
    "x111_dsir_weights", "x112_token_windows_bpe",
    "x114_trainer_shards", "x115_temperature_approx",
    "x116_shard_readback", "x117_epoch_order",
    "x118_blend_schedule", "x119_blend_epochs", "x120_run_resume",
    "x123_unigram_roundtrip", "x124_wordpiece_roundtrip",
    "x125_wordpiece_train_roundtrip", "x126_unigram_train_roundtrip",
    "x127_wordpiece_pair_roundtrip",
    "x128_wordpiece_truncation", "x129_wordpiece_offsets",
    "x130_unigram_offsets", "x131_unigram_pair_truncation",
    "x132_chunk_spans",
    "x133_bpe_pair_truncation", "x134_bpe_offsets",
    "x135_bpe_chunk_spans", "x136_llama3_shape",
    "x137_batch_longest_pad", "x138_wordpiece_cleanup",
]


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(spark_df, duck_df):
    problems = []
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        return [f"columns spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"rowcount spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        sv, dv = s[c], d[c]
        if str(sv.dtype) != str(dv.dtype):
            problems.append(f"dtype[{c}] spark={sv.dtype} duck={dv.dtype}")
        for i, (a, b) in enumerate(zip(sv, dv)):
            eq = (a == b) or (a is None and b is None)
            try:
                if isinstance(a, float) and isinstance(b, float):
                    eq = (a == b) or (math.isnan(a) and math.isnan(b))
            except Exception:
                pass
            if not eq and not (pd.isna(a) and pd.isna(b)):
                problems.append(f"value[{c}][row {i}] spark={a!r} duck={b!r}")
                break
    return problems


def main():
    if "--skip-dump" not in sys.argv:
        cmd = ["sbt", "-batch",
               "runMain graft.tools.DumpOne " + SF1_DIR + " " + OUT_DIR +
               " " + " ".join(QUERIES)]
        r = subprocess.run(cmd, cwd="/root/repo", capture_output=True,
                           text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit("sf1 dump failed")

    con = duckdb.connect()
    for t in TABLES:
        # synthesized tables are Spark-written directories of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF1_DIR}/{t}.parquet/*.parquet')")

    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    result = {}
    n_bad = 0
    for name in QUERIES:
        sql = oracle.get(name)
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        try:
            spark_df = pd.read_parquet(f"{OUT_DIR}/{name}")
            duck_df = con.execute(sql).df()
            entry["spark_rows"] = len(spark_df)
            entry["oracle_rows"] = len(duck_df)
            problems = compare(spark_df, duck_df)
            entry["rows_match"] = len(spark_df) == len(duck_df)
            entry["schema_match"] = not any(
                p.startswith(("columns", "dtype")) for p in problems)
            entry["hash_match"] = not problems
            if problems:
                entry["err"] = "; ".join(problems[:3])
        except Exception as e:
            entry["err"] = str(e)[:500]
        result[name] = entry
        ok = entry["hash_match"]
        n_bad += 0 if ok else 1
        print(("ok   " if ok else "FAIL ") +
              f"{name} ({entry['spark_rows']} rows)" +
              ("" if ok else f": {entry['err']}"))

    with open("/root/repo/CORRECTNESS_SF1.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"\n{len(QUERIES) - n_bad} ok, {n_bad} failed -> CORRECTNESS_SF1.json")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
