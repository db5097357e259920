"""Validated fix recipes for the hostile-string sweep's four KNOWN
divergence classes (tools/hostile_string_sweep.py) — round 11's first
job, staged and proven HERE so applying them is mechanical.

Each recipe is a PRIMITIVE-LEVEL cross-engine identity, asserted by this
script over the same hostile values the sweep injects. Run it before and
after applying the fixes; exit 0 means every primitive agrees.

  lower-unicode  →  ascii_lower = translate(s, 'A-Z', 'a-z') on BOTH
      engines. JVM lower('İ') emits 'i'+U+0307 where utf8proc emits 'i';
      the [a-z0-9] tokenizers and the md5 fingerprint normalization only
      need ASCII case folding, and translate is codepoint-stable on both.
      Applies to: docs_inverted_postings, docs_bm25_search,
      docs_bpe_encode_stats, docs_fingerprint_dedup (+ their oracles,
      and operators/text.py fingerprint/tokenize helpers).

  lev-bytes  →  levenshtein over the ASCII projection
      regexp_replace(s, '[^\\x00-\\x7F]', '?') on BOTH engines (RE2 and
      Java regex both match per CODEPOINT, so each non-ASCII codepoint
      becomes one '?'; the projected strings are pure ASCII where DuckDB
      bytes == Spark codepoints). Applies to: docs_edit_distance_pairs.

  byte-vs-char  →  byte-true oracle slicing through HEX (DuckDB has no
      BLOB substring): frame bytes [off, off+len) restate as
      substr(hex(encode(text)), 2*off+1, 2*len); lengths as
      octet_length(encode(text)); checksums move to md5(hex-slice) with
      the Spark side emitting md5(hex(substring(payload, off+1, len))) —
      Spark and DuckDB hex() agree incl. case. Applies to:
      docs_frame_sampling, docs_scene_change, docs_payload_features
      (denominators/numerators per byte class), docs_payload_resize,
      and keeps docs_audio_chunks/docs_multimodal_meta honest if the
      corpus ever goes non-ASCII.

  json-parse  →  Spark 4 from_json (PERMISSIVE) returns a NULL struct
      ONLY for NULL input or all-ASCII-whitespace input — malformed JSON
      ('{not json', 'null', '[]', 1e999, duplicate keys) yields an
      all-null-fields ROW, which IS NOT NULL. Oracle mirror:
      props IS NOT NULL AND trim(props, ' '||chr(9)||chr(10)||chr(13))
      <> ''   (plain trim() strips only spaces — '\\t' diverged).
      Applies to: events_map_roundtrip.

Each applied fix churns one driver fingerprint; regenerate the oracle
snapshot (tools/update_oracle_snapshot.py) and count the bill against
the round-11 sample before emptying the sweep's KNOWN dict.
"""

from __future__ import annotations

import sys

AZ = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
az = "abcdefghijklmnopqrstuvwxyz"

HOSTILES = [
    "",
    "  \t\n ",
    "naïve café — 文字列 🚀",
    "İstanbul ß ẞ",
    'O\'Reilly "quoted" \\back\\slash',
    ".*[a-z]+(?:$){",
    "x" * 200,
    " 123e4 ",
    "a\x00b",
    "éclair é",
    "hello world 42",
]
JSONS = [
    "",
    "   ",
    "\t",
    "\r\n",
    "{not json",
    "null",
    "[]",
    '{"value": 1e999}',
    '{"dup":1,"dup":2}',
    '{"ключ": "значение"}',
    '{"k": 12}',
    None,
]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.master("local[2]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HOSTILES)], "i int, s string"
    )
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    for i, s in enumerate(HOSTILES):
        con.execute("INSERT INTO t VALUES (?,?)", [i, s])

    srows = (
        df.select(
            "i",
            F.translate("s", AZ, az).alias("al"),
            F.md5(F.translate(F.trim("s"), AZ, az)).alias("fp"),
            F.levenshtein(
                F.regexp_replace("s", r"[^\x00-\x7F]", "?"), F.lit("abcdef")
            ).alias("lev"),
            F.length(F.col("s").cast("binary")).alias("nbytes"),
            F.hex(F.substring(F.col("s").cast("binary"), 3, 4)).alias("hx"),
            F.md5(
                F.hex(F.substring(F.col("s").cast("binary"), 3, 4))
            ).alias("hxm"),
            F.split(F.translate("s", AZ, az), "[^a-z0-9]+").alias("toks"),
        )
        .orderBy("i")
        .collect()
    )
    orows = con.execute(
        rf"""SELECT i,
        translate(s, '{AZ}', '{az}') al,
        md5(translate(trim(s), '{AZ}', '{az}')) fp,
        levenshtein(regexp_replace(s, '[^\x00-\x7F]', '?', 'g'), 'abcdef') lev,
        octet_length(encode(s)) nbytes,
        substr(hex(encode(s)), 5, 8) hx,
        md5(substr(hex(encode(s)), 5, 8)) hxm,
        regexp_split_to_array(translate(s, '{AZ}', '{az}'), '[^a-z0-9]+') toks
      FROM t ORDER BY i"""
    ).fetchall()
    bad = 0
    for sr, orow in zip(srows, orows):
        for k, idx in [
            ("al", 1), ("fp", 2), ("lev", 3), ("nbytes", 4), ("hx", 5),
            ("hxm", 6),
        ]:
            if sr[k] != orow[idx]:
                bad += 1
                print(f"MISMATCH i={sr['i']} {k}: {sr[k]!r} vs {orow[idx]!r}")
        if list(sr["toks"]) != list(orow[7]):
            bad += 1
            print(f"TOKS MISMATCH i={sr['i']}")

    jdf = spark.createDataFrame([(j,) for j in JSONS], "props string")
    spark_keep = [
        (r["props"], r["s"] is not None)
        for r in jdf.select(
            "props", F.from_json("props", "k INT").alias("s")
        ).collect()
    ]
    con.execute("CREATE TABLE j(props VARCHAR)")
    for j in JSONS:
        con.execute("INSERT INTO j VALUES (?)", [j])
    oracle_keep = dict(
        con.execute(
            "SELECT props, props IS NOT NULL AND "
            "trim(props, ' ' || chr(9) || chr(10) || chr(13)) <> '' FROM j"
        ).fetchall()
    )
    for p, sk in spark_keep:
        if sk != oracle_keep.get(p):
            bad += 1
            print(f"JSON MIRROR DIVERGES on {p!r}: spark={sk}")

    print("recipe parity:", "ALL OK" if bad == 0 else f"{bad} FAILURES")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
