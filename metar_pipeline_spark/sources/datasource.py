"""Spark 4 Python DataSource form of the S1 collector.

The reference polls its REST API driver-side in a plain Python loop
(/root/reference/src/collector/main.py:53-69, one process, one HTTP
session). `sources/collector.py` keeps that driver-side shape for the
20-station case; THIS module is the scale form: a registered Spark
DataSource whose input partitions each carry a chunk of stations, so
the fetch itself runs distributed on executors — thousands of stations
poll in parallel, rate-limited per partition, with Spark's task retry
giving per-chunk fault tolerance (a failed chunk re-fetches alone).

The fetch callable is injected by dotted path (DataSource options are
strings), resolved executor-side at read time. The default is the
deterministic offline stand-in below, so the whole source is testable
with no network; production wires an HTTP client function here.

Usage:
    spark.dataSource.register(MetarCollectorDataSource)
    raw = (spark.read.format("metar_collector")
           .option("stations", "UUEE,ULLI")
           .option("stations_per_partition", "5")
           .load())                       # (station, payload)
    flat = normalize_bronze(to_bronze(raw))   # 30-field silver frame
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from metar_pipeline_spark.schemas import RUS_TOP20_ICAO

_DEFAULT_FETCHER = (
    "metar_pipeline_spark.sources.datasource.offline_fetcher"
)


def _parse_stations(options: dict) -> list[str]:
    raw = options.get("stations", "")
    return [s for s in raw.split(",") if s] or list(RUS_TOP20_ICAO)


def _resolve_fetcher(path: str):
    import importlib

    mod, fn = path.rsplit(".", 1)
    return getattr(importlib.import_module(mod), fn)


class StationPartition(InputPartition):
    def __init__(self, stations: Sequence[str], cycle: int = 0):
        self.stations = list(stations)
        self.cycle = cycle


class MetarCollectorDataSource(DataSource):
    """format("metar_collector") — distributed REST collection.

    Options:
      stations                csv of station ids (default: the 20-ICAO
                              domain from schemas.py)
      stations_per_partition  chunk size per Spark task (default 5)
      fetcher                 dotted path to `f(icaos) -> list[str]`
                              resolved on the executor (default: the
                              offline deterministic stand-in)
    """

    @classmethod
    def name(cls) -> str:
        return "metar_collector"

    def schema(self) -> str:
        return "station string, payload string"

    def reader(self, schema) -> "MetarCollectorReader":
        return MetarCollectorReader(self.options)

    def streamReader(self, schema) -> "MetarCollectorStreamReader":
        return MetarCollectorStreamReader(self.options)


class MetarCollectorReader(DataSourceReader):
    def __init__(self, options: dict):
        self.stations = _parse_stations(options)
        self.chunk = int(options.get("stations_per_partition", "5"))
        self.fetcher_path = options.get("fetcher", _DEFAULT_FETCHER)

    def partitions(self) -> list[StationPartition]:
        return [
            StationPartition(self.stations[i : i + self.chunk])
            for i in range(0, len(self.stations), self.chunk)
        ]

    def read(self, partition: StationPartition) -> Iterator[tuple]:
        fetch = _resolve_fetcher(self.fetcher_path)
        for station in partition.stations:
            for payload in fetch([station]):
                yield (station, payload)


def offline_fetcher(icaos: Iterable[str]) -> list[str]:
    """Deterministic offline stand-in for the HTTP GET: one full nested
    METAR document per station, every numeric field md5-derived from the
    station id so any engine (or test) can re-derive the exact values."""
    out = []
    for icao in icaos:
        h = hashlib.md5(icao.encode()).hexdigest()

        def field(i: int, lo: float, hi: float) -> float:
            frac = int(h[i * 2 : i * 2 + 2], 16) / 255.0
            return round(lo + frac * (hi - lo), 1)

        doc = {
            "icao": icao,
            "observed": "2024-01-10T12:30:00",
            "raw_text": f"{icao} 101230Z 24005MPS",
            "flight_category": "VFR" if int(h[0], 16) % 2 == 0 else "IFR",
            "temperature": {
                "celsius": field(1, -30.0, 30.0),
                "fahrenheit": None,
            },
            "dewpoint": {"celsius": field(2, -35.0, 25.0)},
            "wind": {
                "degrees": field(3, 0.0, 359.0),
                "speed_kts": field(4, 0.0, 60.0),
                "gust_kts": field(5, 0.0, 80.0),
            },
            "visibility": {"meters_float": field(6, 100.0, 9999.0)},
            "barometer": {"hpa": field(7, 950.0, 1050.0)},
            "humidity": {"percent": field(8, 0.0, 100.0)},
            "station": {
                "name": f"Station {icao}",
                "location": f"City {icao}",
                "geometry": {
                    "type": "Point",
                    "coordinates": [
                        field(9, -180.0, 180.0),
                        field(10, -90.0, 90.0),
                    ],
                },
            },
        }
        out.append(json.dumps(doc, sort_keys=True))
    return out


def to_bronze(raw: DataFrame) -> DataFrame:
    """(station, payload) → bronze (id, payload, inserted_at): the same
    content-addressed bronze contract raw_to_bronze produces, minus the
    driver-side createDataFrame hop."""
    return raw.select(
        F.md5("payload").alias("id"),
        "payload",
        F.current_timestamp().alias("inserted_at"),
    )


def collect_distributed(
    spark: SparkSession,
    stations: Sequence[str] | None = None,
    fetcher: str = _DEFAULT_FETCHER,
    stations_per_partition: int = 5,
) -> DataFrame:
    """Register (idempotent) + read + normalize: the distributed twin of
    collector.collect_once, returning the identical flat silver frame
    (test-verified row-for-row against the driver-side form)."""
    from metar_pipeline_spark.sources.collector import normalize_bronze

    spark.dataSource.register(MetarCollectorDataSource)
    reader = (
        spark.read.format("metar_collector")
        .option("fetcher", fetcher)
        .option("stations_per_partition", str(stations_per_partition))
    )
    if stations:
        reader = reader.option("stations", ",".join(stations))
    return normalize_bronze(to_bronze(reader.load()))


class MetarCollectorStreamReader(DataSourceStreamReader):
    """Micro-batch streaming form of the collector: each batch is ONE
    poll cycle over the station list (the reference's 30-minute Airflow
    cadence, main.py:53-69 — expressed as a native Spark stream with
    exactly-once offsets instead of an external scheduler).

    Partition-based DataSourceStreamReader, NOT the Simple variant: the
    planner only moves {cycle} offsets; each micro-batch fans out one
    StationPartition per station chunk and the fetch itself runs on
    EXECUTORS with task-retry — the same distributed-collection shape
    as the batch reader. Replay after a crash re-plans partitions for
    the committed offset range and re-fetches deterministically.

    The offset is the cycle counter; `max_cycles` bounds what
    latestOffset reports as available, so bounded runs terminate
    cleanly and a restart with a HIGHER bound (new data arrived)
    resumes exactly after the checkpointed cycle — the offset-
    continuity contract the test exercises.
    """

    def __init__(self, options: dict):
        self.stations = _parse_stations(options)
        self.chunk = int(options.get("stations_per_partition", "5"))
        self.fetcher_path = options.get("fetcher", _DEFAULT_FETCHER)
        self.max_cycles = int(options.get("max_cycles", "1"))

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def latestOffset(self) -> dict:
        # all cycles up to the bound are "available now"; a production
        # poller derives this from the wall clock (elapsed // cadence),
        # so each 30-minute trigger exposes exactly one new cycle. The
        # planner processes the (committed, latest] range and resumes
        # from the checkpointed offset after any restart.
        return {"cycle": self.max_cycles}

    def partitions(self, start: dict, end: dict):
        parts = []
        for cycle in range(int(start["cycle"]), int(end["cycle"])):
            parts.extend(
                StationPartition(self.stations[i : i + self.chunk], cycle)
                for i in range(0, len(self.stations), self.chunk)
            )
        # zero-partition batches are not allowed; emit an empty chunk
        return parts or [StationPartition([], int(start["cycle"]))]

    def read(self, partition: StationPartition) -> Iterator[tuple]:
        fetch = _resolve_fetcher(self.fetcher_path)
        for station in partition.stations:
            for payload in fetch([station]):
                yield (station, payload)

    def commit(self, end: dict) -> None:
        pass
