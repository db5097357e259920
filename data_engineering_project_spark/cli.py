"""CLI entry — the analog of the reference's ``main.py`` argparse surface
(``main.py:249-258``: ``--user-agent`` plus input/output paths), minus the
Windows/Hadoop scaffolding and the per-date driver loop.

Run either mode:

    python -m data_engineering_project_spark.cli batch \
        --input-dir raw_data --output-dir output --user-agent "some user agent"

    python -m data_engineering_project_spark.cli stream \
        --input-dir landing --output-dir report --checkpoint-dir ckpt
"""

from __future__ import annotations

import argparse
import sys


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="data_engineering_project_spark")
    sub = parser.add_subparsers(dest="mode", required=True)

    batch = sub.add_parser("batch", help="one-shot daily report (Task-1 analog)")
    stream = sub.add_parser(
        "stream", help="incremental Structured-Streaming mode (replaces cron)"
    )
    for p in (batch, stream):
        p.add_argument("--input-dir", required=True, help="event parquet landing dir")
        p.add_argument("--output-dir", required=True, help="report output dir")
        p.add_argument(
            "--user-agent",
            default=None,
            help="filter on device_settings.user_agent (reference main.py:253)",
        )
        p.add_argument("--master", default="local[*]")
    stream.add_argument("--checkpoint-dir", required=True)
    stream.add_argument(
        "--available-now",
        action="store_true",
        help="drain the backlog and stop (cron-replacement trigger)",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from data_engineering_project_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name=f"dep-spark-{args.mode}", master=args.master)
    try:
        if args.mode == "batch":
            from data_engineering_project_spark.pipeline import run_daily_report

            result = run_daily_report(
                spark,
                args.input_dir,
                args.output_dir,
                user_agent=args.user_agent,
            )
            for path in result.csv_paths:
                print(path)
            n_invalid = result.invalid.count()
            if n_invalid:
                print(f"dead-letter rows: {n_invalid}", file=sys.stderr)
        else:
            from data_engineering_project_spark.streaming.pipeline import (
                run_incremental_report,
            )

            # streaming file sources need a declared schema; pin it from the
            # files already landed (schema-on-read, but declared — bad later
            # files fail fast instead of corrupting the aggregate)
            schema = spark.read.parquet(args.input_dir).schema
            run_incremental_report(
                spark,
                args.input_dir,
                args.output_dir,
                args.checkpoint_dir,
                schema,
                available_now=args.available_now,
            )
        return 0
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
