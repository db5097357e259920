"""Operational surface: setup verification, health probes, scheduling.

Reference analogs: ``verify_setup.py`` (structure / env / database / Spark
checks before first run), ``docker/entrypoint.sh:4-24`` (JAVA_HOME + java
binary verification, run-once-then-cron lifecycle), ``docker/cron/
schedules.py:16-23`` (per-environment cron strings), and the docker-compose
``pg_isready`` healthcheck (``docker/docker-compose.yml:12-16``).

Spark-first re-design: the reference schedules a *full re-read* of the
landing directory every cron tick. Here each tick runs the ``availableNow``
streaming trigger instead — exactly-once incremental drain with all progress
state in the checkpoint — so the scheduler can die and restart at any point
with no duplicate or lost work. At 100 TB that difference is the whole game:
a tick re-processes only new files, never the backlog.

Everything here is driver-side control plane (filesystem stats, one-row
probes); no data path runs through this module.
"""

from __future__ import annotations

import glob
import importlib
import os
import sys
import time
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from datetime import datetime, timedelta

# ---------------------------------------------------------------------------
# schedules — string-parity with reference docker/cron/schedules.py:16-23
# ---------------------------------------------------------------------------

#: runs every minute (reference TESTING_SCHEDULE)
TESTING_SCHEDULE = "* * * * *"
#: runs at 00:00, 06:00, 12:00, 18:00 (reference PRODUCTION_SCHEDULE)
PRODUCTION_SCHEDULE = "0 */6 * * *"
#: runs every 5 minutes (reference DEVELOPMENT_SCHEDULE)
DEVELOPMENT_SCHEDULE = "*/5 * * * *"

_SCHEDULES = {
    "testing": TESTING_SCHEDULE,
    "development": DEVELOPMENT_SCHEDULE,
    "production": PRODUCTION_SCHEDULE,
}


def get_schedule(environment: str = "testing") -> str:
    """Environment → cron string (reference ``schedules.py:25-40``; same
    fallback-to-testing behavior for unknown names)."""
    return _SCHEDULES.get(environment, TESTING_SCHEDULE)


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field → the set of matching values. Supports ``*``,
    ``*/n``, ``a``, ``a-b``, ``a-b/n`` and comma lists thereof."""
    out: set[int] = set()
    for part in spec.split(","):
        body, _, step_s = part.partition("/")
        step = int(step_s) if step_s else 1
        if step <= 0:
            raise ValueError(f"bad cron step in {part!r}")
        if body == "*":
            lo_p, hi_p = lo, hi
        elif "-" in body:
            a, b = body.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(body)
        if not (lo <= lo_p <= hi_p <= hi):
            raise ValueError(f"cron value out of range in {part!r}")
        out.update(range(lo_p, hi_p + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    """Parsed 5-field cron expression (minute hour dom month dow).

    Standard vixie-cron semantics: when BOTH day-of-month and day-of-week are
    restricted the entry fires when *either* matches; dow 0 and 7 are Sunday.
    """

    minutes: frozenset[int]
    hours: frozenset[int]
    dom: frozenset[int]
    months: frozenset[int]
    dow: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool

    @classmethod
    def parse(cls, expr: str) -> CronSchedule:
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(f"cron expression needs 5 fields: {expr!r}")
        mi, hr, dom, mon, dow = fields
        # dow allows 0-7 with both 0 and 7 meaning Sunday (schedules.py:8)
        dow_set = frozenset(v % 7 for v in _parse_field(dow, 0, 7))
        return cls(
            minutes=_parse_field(mi, 0, 59),
            hours=_parse_field(hr, 0, 23),
            dom=_parse_field(dom, 1, 31),
            months=_parse_field(mon, 1, 12),
            dow=dow_set,
            dom_restricted=dom != "*",
            dow_restricted=dow != "*",
        )

    def matches(self, t: datetime) -> bool:
        if t.minute not in self.minutes or t.hour not in self.hours:
            return False
        if t.month not in self.months:
            return False
        dom_ok = t.day in self.dom
        dow_ok = t.isoweekday() % 7 in self.dow  # Monday=1 → cron Sunday=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok


def cron_next(expr: str | CronSchedule, after: datetime) -> datetime:
    """First fire time strictly after ``after`` (minute granularity)."""
    sched = CronSchedule.parse(expr) if isinstance(expr, str) else expr
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    # minute-resolution scan, bounded at ~366 days — every supported
    # expression fires at least monthly, so the bound is never the answer
    for _ in range(366 * 24 * 60):
        if sched.matches(t):
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"no fire time within a year for {expr!r}")


def run_on_schedule(
    tick: Callable[[datetime], None],
    expr: str,
    *,
    max_ticks: int | None = None,
    now_fn: Callable[[], datetime] = datetime.now,
    sleep_fn: Callable[[float], None] = time.sleep,
    run_immediately: bool = True,
    on_error: Callable[[datetime, Exception], None] | None = None,
) -> int:
    """Cron-replacement driver loop: run ``tick`` on the schedule.

    Mirrors the entrypoint lifecycle (``entrypoint.sh:60-66``: one immediate
    run, then cron cadence). A failing tick is logged-and-continued, like a
    cron job that exits nonzero — the schedule must survive a bad batch.
    ``now_fn``/``sleep_fn`` are injectable so tests drive a fake clock.
    ``max_ticks`` bounds the TOTAL tick count (immediate run included);
    returns the number of ticks executed.
    """
    sched = CronSchedule.parse(expr)
    ran = 0

    def _run_once(at: datetime) -> None:
        nonlocal ran
        try:
            tick(at)
        except Exception as e:  # noqa: BLE001 — cron semantics: log, continue
            if on_error is not None:
                on_error(at, e)
        ran += 1

    if run_immediately:
        _run_once(now_fn())
    while max_ticks is None or ran < max_ticks:
        nxt = cron_next(sched, now_fn())
        wait = (nxt - now_fn()).total_seconds()
        if wait > 0:
            sleep_fn(wait)
        _run_once(nxt)
    return ran


# ---------------------------------------------------------------------------
# verify-setup — reference verify_setup.py re-expressed for this engine
# ---------------------------------------------------------------------------


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""


@dataclass
class OpsReport:
    checks: list[CheckResult] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return all(c.ok for c in self.checks)

    def add(self, name: str, ok: bool, detail: str = "") -> None:
        self.checks.append(CheckResult(name, bool(ok), detail))

    def as_dict(self) -> dict:
        return {
            "ok": self.ok,
            "checks": [
                {"name": c.name, "ok": c.ok, "detail": c.detail}
                for c in self.checks
            ],
        }


REQUIRED_PACKAGES = ("pyspark", "pandas", "pyarrow", "duckdb")


def verify_setup(
    *,
    required_dirs: Sequence[str] = (),
    create_missing: bool = True,
    warehouse_db: str | None = None,
    spark=None,
) -> OpsReport:
    """Pre-flight checks before the first scheduled run.

    Reference parity (``verify_setup.py``): structure check creates missing
    directories rather than failing; environment check asserts the Python
    version and importable core packages; Spark check runs a real one-row
    job; database check opens a live connection. The Postgres ``pg_isready``
    probe maps to a ``SELECT 1`` on the embedded warehouse (the JDBC path
    runs the same probe through its own connection).
    """
    rep = OpsReport()

    java_home = os.environ.get("JAVA_HOME", "")
    java_bin = os.path.join(java_home, "bin", "java")
    rep.add(
        "java",
        bool(java_home) and os.path.isdir(java_home) and os.access(java_bin, os.X_OK),
        java_home or "JAVA_HOME not set",  # entrypoint.sh:4-24
    )

    rep.add(
        "python",
        sys.version_info >= (3, 10),
        f"{sys.version_info.major}.{sys.version_info.minor}",
    )

    missing = []
    for pkg in REQUIRED_PACKAGES:
        try:
            importlib.import_module(pkg)
        except ImportError:
            missing.append(pkg)
    rep.add("packages", not missing, ",".join(missing) or "all present")

    created = []
    absent = []
    for d in required_dirs:
        if os.path.isdir(d):
            continue
        if create_missing:
            os.makedirs(d, exist_ok=True)
            created.append(d)
        else:
            absent.append(d)
    rep.add(
        "structure",
        not absent,
        f"created: {created}" if created else (f"missing: {absent}" if absent else "ok"),
    )

    if spark is not None:
        try:
            n = spark.range(10).count()
            rep.add("spark", n == 10, f"probe job counted {n}")
        except Exception as e:  # noqa: BLE001
            rep.add("spark", False, str(e)[:200])

    if warehouse_db is not None:
        try:
            import duckdb

            con = duckdb.connect(warehouse_db)
            one = con.execute("SELECT 1").fetchone()[0]
            con.close()
            rep.add("warehouse", one == 1, warehouse_db)
        except Exception as e:  # noqa: BLE001
            rep.add("warehouse", False, str(e)[:200])

    return rep


# ---------------------------------------------------------------------------
# healthcheck — is the *running* pipeline alive and current?
# ---------------------------------------------------------------------------


def healthcheck(
    *,
    checkpoint_dir: str | None = None,
    output_dir: str | None = None,
    warehouse_db: str | None = None,
    max_age_seconds: float | None = None,
    now_fn: Callable[[], float] = time.time,
) -> OpsReport:
    """Liveness probe for a scheduled deployment (compose-healthcheck analog).

    - checkpoint: the streaming query's last committed batch
      (``<ckpt>/commits/<n>``) must exist and, with ``max_age_seconds``, be
      recent — a stalled drain ages out and flips the probe.
    - output: at least one report CSV present and non-empty.
    - warehouse: target table reachable and row count readable.
    """
    rep = OpsReport()

    if checkpoint_dir is not None:
        commits = sorted(glob.glob(os.path.join(checkpoint_dir, "commits", "*")))
        commits = [c for c in commits if not os.path.basename(c).startswith(".")]
        if not commits:
            rep.add("checkpoint", False, "no committed batches")
        else:
            age = now_fn() - os.path.getmtime(commits[-1])
            fresh = max_age_seconds is None or age <= max_age_seconds
            rep.add(
                "checkpoint",
                fresh,
                f"batch {os.path.basename(commits[-1])}, age {age:.0f}s",
            )

    if output_dir is not None:
        csvs = sorted(glob.glob(os.path.join(output_dir, "task1_output_*.csv")))
        nonempty = [p for p in csvs if os.path.getsize(p) > 0]
        rep.add(
            "output",
            bool(nonempty),
            f"{len(nonempty)} report files" if nonempty else "no report CSVs",
        )

    if warehouse_db is not None:
        try:
            import duckdb

            con = duckdb.connect(warehouse_db)
            n = con.execute("SELECT count(*) FROM client_report").fetchone()[0]
            con.close()
            rep.add("warehouse", True, f"client_report rows={n}")
        except Exception as e:  # noqa: BLE001
            rep.add("warehouse", False, str(e)[:200])

    return rep
