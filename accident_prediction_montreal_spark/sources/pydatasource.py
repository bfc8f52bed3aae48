"""Spark 4 Python DataSource re-expression of the reference's scraped
weather sources (SURVEY.md §2 S5-S7).

The reference fetches Environment Canada observations through scalar
UDFs that perform HTTP inside the executor (reference weather.py:59-82,
114-149, 251-295). sources/adapters.py ports that UDF-source PATTERN
over local fixtures; THIS module is the idiomatic Spark-4 form — a
first-class ``DataSource`` the engine registers and reads like any
built-in format:

  * one ``InputPartition`` per station → the same per-station
    parallelism the reference gets from ``repartition(200, ...)``
    before its UDF (weather.py:206), but planner-visible;
  * ``pushFilters`` handles ``station_id`` equality/IN natively, so a
    query for one station PRUNES the other partitions before any
    "fetch" happens — the capability the UDF form fundamentally cannot
    express (a UDF source always fetches, then filters);
  * no network in this sandbox, so the per-station payload is the
    deterministic integer-modular observation grid the apm fixtures
    use (plans/apm_pipeline.py::_weather) — the TRANSPORT is stubbed,
    the source machinery (registration, schema, partition planning,
    pushdown, Arrow-batched rows) is real and driver-checkable.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    WriterCommitMessage,
)


class StationPartition(InputPartition):
    def __init__(self, station_id: int, start_day: int, n_days: int):
        self.station_id = station_id
        self.start_day = start_day
        self.n_days = n_days


class WeatherFixtureReader(DataSourceReader):
    """Deterministic per-station hourly observations for 1995.

    Values mirror plans/apm_pipeline.py::_weather's closed form so any
    oracle can regenerate them: for station s, day-of-year d, hour h —
    temp = ((s*31 + d*7 + h*3) % 50) - 10, risky = (s*3 + d + h) % 10 == 0.
    """

    def __init__(self, options):
        self.n_stations = int(options.get("stations", "4"))
        self.n_days = int(options.get("days", "365"))
        self.station_filter: set[int] | None = None

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("station_id",):
                wanted = {int(f.value)}
                self.station_filter = (
                    wanted
                    if self.station_filter is None
                    else self.station_filter & wanted
                )
            elif isinstance(f, In) and f.attribute == ("station_id",):
                wanted = {int(v) for v in f.value}
                self.station_filter = (
                    wanted
                    if self.station_filter is None
                    else self.station_filter & wanted
                )
            else:
                yield f  # not ours — Spark evaluates it post-scan

    def partitions(self):
        stations = range(self.n_stations)
        if self.station_filter is not None:
            stations = [s for s in stations if s in self.station_filter]
        return [StationPartition(s, 1, self.n_days) for s in stations]

    def read(self, partition: StationPartition):
        s = partition.station_id
        for d in range(partition.start_day, partition.start_day + partition.n_days):
            for h in range(24):
                yield (
                    s,
                    d,
                    h,
                    float(((s * 31 + d * 7 + h * 3) % 50) - 10),
                    1.0 if (s * 3 + d + h) % 10 == 0 else 0.0,
                )


class DayRangePartition(InputPartition):
    def __init__(self, station_id: int, start_day: int, end_day: int):
        self.station_id = station_id
        self.start_day = start_day
        self.end_day = end_day


class WeatherFixtureStreamReader(DataSourceStreamReader):
    """Micro-batch STREAM of the same observation grid: the offset is
    the next unread day-of-year, so each micro-batch covers
    [start_day, end_day) x stations — one InputPartition per station
    per batch (same parallelism as the batch reader). ``days_per_batch``
    bounds batch size; ``commit`` is the exactly-once hook (a real
    feed would ack upstream here — nothing to ack for a fixture).
    With Trigger.AvailableNow the runner drains to latestOffset and
    stops: bounded, deterministic, checkpoint-replayable.
    """

    def __init__(self, options):
        self.n_stations = int(options.get("stations", "4"))
        self.n_days = int(options.get("days", "30"))
        self.days_per_batch = int(options.get("days_per_batch", "7"))

    def initialOffset(self) -> dict:
        return {"next_day": 1}

    def latestOffset(self) -> dict:
        return {"next_day": self.n_days + 1}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["next_day"]), int(end["next_day"])
        return [DayRangePartition(s, lo, hi) for s in range(self.n_stations)]

    def read(self, partition: DayRangePartition):
        s = partition.station_id
        for d in range(partition.start_day, partition.end_day):
            for h in range(24):
                yield (
                    s,
                    d,
                    h,
                    float(((s * 31 + d * 7 + h * 3) % 50) - 10),
                    1.0 if (s * 3 + d + h) % 10 == 0 else 0.0,
                )

    def commit(self, end: dict) -> None:
        pass  # fixture source: nothing upstream to acknowledge


class WeatherFixtureDataSource(DataSource):
    @classmethod
    def name(cls):
        return "weatherfix"

    def schema(self):
        return (
            "station_id INT, day_of_year INT, hour INT, "
            "temp DOUBLE, risky_weather DOUBLE"
        )

    def reader(self, schema):
        return WeatherFixtureReader(self.options)

    def streamReader(self, schema):
        return WeatherFixtureStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the ``weatherfix`` format."""
    spark.dataSource.register(WeatherFixtureDataSource)


# --- Custom Python SINK: two-phase-commit text writer -------------------------


class StagedFile(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class AtomicTextWriter(DataSourceWriter):
    """Executor-side CSV-line writer with a real two-phase commit: each
    task writes to ``<path>/_staging/part-<uuid>`` and reports the file
    in its commit message; ``commit`` (driver-side, after ALL tasks
    succeed) renames staged files into the target and drops a _SUCCESS
    marker; ``abort`` deletes the staging leftovers. A task that fails
    mid-write therefore never leaves a partial file visible — the
    exactly-once contract S11's driver-side ``open().write`` cannot
    give (reference export_results.py:17-46)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("atomictext requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.csv")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(",".join("" if v is None else str(v) for v in row) + "\n")
                n += 1
        return StagedFile(staged, n)

    def commit(self, messages):
        import os
        import shutil

        if self.overwrite:
            for name in os.listdir(self.path):
                if name != "_staging":
                    os.remove(os.path.join(self.path, name))
        total = 0
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)
            total += m.n_rows
        staging = os.path.join(self.path, "_staging")
        shutil.rmtree(staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class AtomicTextDataSource(DataSource):
    @classmethod
    def name(cls):
        return "atomictext"

    def writer(self, schema, overwrite: bool):
        return AtomicTextWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(AtomicTextDataSource)
