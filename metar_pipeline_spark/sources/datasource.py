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
    InputPartition,
    SimpleDataSourceStreamReader,
)

from metar_pipeline_spark.schemas import RUS_TOP20_ICAO

_DEFAULT_FETCHER = (
    "metar_pipeline_spark.sources.datasource.offline_fetcher"
)


class StationPartition(InputPartition):
    def __init__(self, stations: Sequence[str]):
        self.stations = list(stations)


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

    def simpleStreamReader(self, schema) -> "MetarCollectorStreamReader":
        return MetarCollectorStreamReader(self.options)


class MetarCollectorReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("stations", "")
        self.stations = [s for s in raw.split(",") if s] or list(
            RUS_TOP20_ICAO
        )
        self.chunk = int(options.get("stations_per_partition", "5"))
        self.fetcher_path = options.get("fetcher", _DEFAULT_FETCHER)

    def partitions(self) -> list[StationPartition]:
        return [
            StationPartition(self.stations[i : i + self.chunk])
            for i in range(0, len(self.stations), self.chunk)
        ]

    def read(self, partition: StationPartition) -> Iterator[tuple]:
        import importlib

        mod, fn = self.fetcher_path.rsplit(".", 1)
        fetch = getattr(importlib.import_module(mod), fn)
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


class MetarCollectorStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming form of the collector: each batch is ONE
    poll cycle over the station list (the reference's 30-minute Airflow
    cadence, main.py:53-69 — expressed as a native Spark stream with
    exactly-once offsets instead of an external scheduler).

    The offset is simply the cycle counter; `max_cycles` bounds the
    stream for tests/backfills — once reached, read() returns no rows
    and the same offset, so the stream idles. Python micro-batch
    sources don't support Trigger.AvailableNow (Spark falls back to
    single-batch execution), so each bounded run processes ONE cycle;
    restarting from the same checkpoint resumes at the next cycle —
    the exactly-once offset contract across restarts is the point.
    """

    def __init__(self, options: dict):
        raw = options.get("stations", "")
        self.stations = [s for s in raw.split(",") if s] or list(
            RUS_TOP20_ICAO
        )
        self.fetcher_path = options.get("fetcher", _DEFAULT_FETCHER)
        self.max_cycles = int(options.get("max_cycles", "1"))

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def read(self, start: dict):
        cycle = int(start["cycle"])
        if cycle >= self.max_cycles:
            return iter([]), {"cycle": cycle}
        import importlib

        mod, fn = self.fetcher_path.rsplit(".", 1)
        fetch = getattr(importlib.import_module(mod), fn)
        rows = [
            (station, payload)
            for station in self.stations
            for payload in fetch([station])
        ]
        return iter(rows), {"cycle": cycle + 1}

    def commit(self, end: dict) -> None:
        pass
