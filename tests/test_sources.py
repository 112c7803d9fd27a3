"""Catalog loader invariants — regression tests for the events.ts
canonicalization (round-2 defect: parquet TIMESTAMP(MICROS,
isAdjustedToUTC=false) reads as TIMESTAMP_NTZ and broke every
epoch-arithmetic site) and the typed-OCF NaN/null distinction.
"""

from __future__ import annotations

import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anglerfish_spark.sources.registry import load_table
from tests.conftest import SF_DIR


class TestEventsTsCanonicalization:
    def test_driver_parquet_ts_is_timestamp_type(self, spark):
        """Whatever the parquet stores, load_table must emit LTZ micros."""
        ev = load_table(spark, SF_DIR, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType)

    def test_epoch_arithmetic_analyzes(self, spark):
        """The exact expressions that failed at analysis time in round 2."""
        ev = load_table(spark, SF_DIR, "events")
        row = ev.select(
            F.unix_micros("ts").alias("us"),
            F.window("ts", "1 hour").start.cast("long").alias("ws"),
        ).first()
        assert row.us is not None and row.ws is not None

    @pytest.mark.parametrize("store", ["ntz", "ltz"])
    def test_all_storage_forms_same_wall_clock(self, spark, store, tmp_path):
        """µs-NTZ and µs-LTZ storage of the same instant load identically
        (session tz is UTC, so the NTZ→LTZ cast preserves the wall clock)."""
        sf = str(tmp_path / store)
        os.makedirs(sf)
        tz = "UTC" if store == "ltz" else None
        tbl = pa.table(
            {
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us", tz=tz)),
            }
        )
        pq.write_table(tbl, os.path.join(sf, "events.parquet"))
        ev = load_table(spark, sf, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
        assert ev.select(F.unix_micros("ts")).first()[0] == 1_700_000_000_000_000


class TestTypedOcfNanNull:
    def test_nan_survives_and_null_stays_null(self, spark):
        """Avro doubles support NaN: a NaN value must round-trip as NaN,
        a SQL NULL as null — the Arrow write path keeps them distinct
        (pandas float64 cannot)."""
        from anglerfish_spark.sources.avro_ocf import (
            read_avro_ocf_typed,
            write_avro_ocf_typed,
        )

        df = spark.createDataFrame(
            [(1, float("nan")), (2, None), (3, 2.5)], "id bigint, x double"
        )
        out = tempfile.mkdtemp(prefix="anglerfish_nan_")
        schema_json = write_avro_ocf_typed(df, out, name="nan_case")
        back = {r.id: r.x for r in read_avro_ocf_typed(spark, out, schema_json).collect()}
        assert math.isnan(back[1])
        assert back[2] is None
        assert back[3] == 2.5
