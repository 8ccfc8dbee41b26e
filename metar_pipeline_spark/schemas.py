"""Schemas: the METAR payload StructType and the medallion layer types.

The reference's schema lives implicitly in two places:
- the collector's normalized 30-field doc
  (/root/reference/src/collector/main.py:86-172), and
- the stg model's SELECT-list casts
  (/root/reference/dbt/models/stg/stg_metar_observations.sql:22-40).

Here both become explicit StructTypes. ``from_json`` in PERMISSIVE mode
reproduces Postgres ``payload ->> 'k'`` NULL-on-missing-key semantics
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Nested CheckWX METAR document, as fetched by the collector
# (/root/reference/src/collector/main.py:92-165). Arrays `clouds` and
# `conditions` are kept opaque structs like the reference does
# (main.py:164-165).
METAR_NESTED_SCHEMA = T.StructType(
    [
        T.StructField("icao", T.StringType()),
        T.StructField("observed", T.StringType()),
        T.StructField("raw_text", T.StringType()),
        T.StructField("raw", T.StringType()),
        T.StructField("flight_category", T.StringType()),
        T.StructField(
            "temperature",
            T.StructType(
                [
                    T.StructField("celsius", T.DoubleType()),
                    T.StructField("fahrenheit", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "dewpoint",
            T.StructType(
                [
                    T.StructField("celsius", T.DoubleType()),
                    T.StructField("fahrenheit", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "wind",
            T.StructType(
                [
                    T.StructField("degrees", T.DoubleType()),
                    T.StructField("speed_kts", T.DoubleType()),
                    T.StructField("speed_mps", T.DoubleType()),
                    T.StructField("speed_kph", T.DoubleType()),
                    T.StructField("speed_mph", T.DoubleType()),
                    T.StructField("gust_kts", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "visibility",
            T.StructType(
                [
                    T.StructField("meters", T.StringType()),
                    T.StructField("meters_float", T.DoubleType()),
                    T.StructField("miles", T.StringType()),
                    T.StructField("miles_float", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "barometer",
            T.StructType(
                [
                    T.StructField("hg", T.DoubleType()),
                    T.StructField("hpa", T.DoubleType()),
                    T.StructField("kpa", T.DoubleType()),
                    T.StructField("mb", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "ceiling",
            T.StructType(
                [
                    T.StructField("feet", T.DoubleType()),
                    T.StructField("meters", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "humidity",
            T.StructType([T.StructField("percent", T.DoubleType())]),
        ),
        T.StructField(
            "elevation",
            T.StructType(
                [
                    T.StructField("feet", T.DoubleType()),
                    T.StructField("meters", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "station",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("location", T.StringType()),
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "geometry",
                        T.StructType(
                            [
                                T.StructField("type", T.StringType()),
                                T.StructField(
                                    "coordinates", T.ArrayType(T.DoubleType())
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "clouds",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("feet", T.DoubleType()),
                        T.StructField("meters", T.DoubleType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "conditions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType()),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# Flat normalized observation — the collector's output doc
# (/root/reference/src/collector/main.py:111-170) ≡ the stg table
# (/root/reference/dbt/models/stg/stg_metar_observations.sql:22-40).
# Postgres `float` is float8, hence DoubleType (SURVEY.md §1.3).
METAR_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("icao", T.StringType()),
        T.StructField("observed", T.TimestampType()),
        T.StructField("flight_category", T.StringType()),
        T.StructField("temperature_c", T.DoubleType()),
        T.StructField("dewpoint_c", T.DoubleType()),
        T.StructField("wind_dir_deg", T.DoubleType()),
        T.StructField("wind_speed_kt", T.DoubleType()),
        T.StructField("wind_gust_kt", T.DoubleType()),
        T.StructField("visibility_m", T.DoubleType()),
        T.StructField("barometer_hpa", T.DoubleType()),
        T.StructField("humidity_percent", T.DoubleType()),
        T.StructField("station_name", T.StringType()),
        T.StructField("station_location", T.StringType()),
        T.StructField("station_lon", T.DoubleType()),
        T.StructField("station_lat", T.DoubleType()),
        T.StructField("raw_text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

# Raw semi-structured layer: public.metar_raw_json
# (/root/reference/src/etl/mongo_to_postgres.py:58-64).
METAR_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("payload", T.StringType(), nullable=False),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

# The fixed 20-station list (/root/reference/src/collector/main.py:23-44),
# also the accepted_values test domain
# (/root/reference/dbt/models/stg/schema.yml:23-45).
RUS_TOP20_ICAO = [
    "UUEE", "UUDD", "UUWW", "ULLI", "URSS", "USSS", "UKFF", "UNNT",
    "URKK", "UWUU", "UWWW", "UWKD", "URRR", "UNKL", "URMM", "UHWW",
    "UHHH", "UIII", "USTR", "UMKK",
]
