"""Cost attribution for docs_pii_redaction (round-13 slope 6.57).

The plan shape is already the 100 TB ideal (map-only scan, pii_text
evaluated once, narrow per-source partial agg — plans/r13/
docs_pii_redaction_before.txt); the slope is pure per-task work: SIX
java.util.regex passes per document (three counts on the ORIGINAL
augmented text + the sequential three-step replace chain), against
DuckDB's RE2. No pass can be dropped without changing semantics on
adversarial inputs:

- counts derived from the redacted string (marker occurrences, or
  length deltas per chain step) see POST-replacement text — an SSN
  embedded inside an email is counted by the spec (each count scans the
  original) but invisible after the email is masked;
- one alternation pass ``(email)|(ssn)|(phone)`` consumes overlapping
  matches that the three independent scans each count.

So the A/B only ATTRIBUTES the cost between the count passes and the
replace chain to document the floor:

- v1_counts_only: augmentation + the three regexp_count passes.
- v2_redact_only: augmentation + the 3-step replace chain + length.
- v3_augment_only: augmentation + length (no regex at all) — the
  scan/concat baseline both regex variants sit on.

Run:  SPARK_GRAFT_SF_DIR=/root/repo/.localdata/sf0.5 \
      SPARK_GRAFT_SF_SMALL_DIR=/root/testdata/sf0.1 \
      python tools/ab_pii.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_project_spark.operators import curation as C
from data_engineering_project_spark.plans.curation_queries import (
    docs_pii_redaction,
    _pii_augmented,
)
from tools.ab_harness import run_ab


def v0_current(spark, sf_dir):
    return docs_pii_redaction(spark, sf_dir)


def v1_counts_only(spark, sf_dir):
    aug = _pii_augmented(spark, sf_dir)
    counted = aug.select(
        "source",
        C.pii_count(F.col("pii_text"), "email").alias("n_email"),
        C.pii_count(F.col("pii_text"), "ssn").alias("n_ssn"),
        C.pii_count(F.col("pii_text"), "phone").alias("n_phone"),
    )
    return counted.groupBy("source").agg(
        F.sum("n_email").alias("n_emails"),
        F.sum("n_ssn").alias("n_ssns"),
        F.sum("n_phone").alias("n_phones"),
    )


def v2_redact_only(spark, sf_dir):
    aug = _pii_augmented(spark, sf_dir)
    counted = aug.select(
        "source",
        F.length(C.redact_pii(F.col("pii_text"))).alias("redacted_len"),
    )
    return counted.groupBy("source").agg(
        F.sum("redacted_len").alias("redacted_chars"),
    )


def v3_augment_only(spark, sf_dir):
    aug = _pii_augmented(spark, sf_dir)
    return aug.select(
        "source", F.length(F.col("pii_text")).alias("aug_len")
    ).groupBy("source").agg(F.sum("aug_len").alias("aug_chars"))


if __name__ == "__main__":
    # cost ATTRIBUTION, not alternatives: each variant computes a
    # different (strict subset) aggregate on purpose, so the harness's
    # identical-rows equivalence check does not apply
    run_ab(
        {
            "v0_current": v0_current,
            "v1_counts_only": v1_counts_only,
            "v2_redact_only": v2_redact_only,
            "v3_augment_only": v3_augment_only,
        },
        equivalence_check=False,
    )
