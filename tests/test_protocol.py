"""Protocol / table features (Delta's table-features model): every
capability that changes read or write semantics is recorded as a
``delta.feature.<name> = supported`` property stamped into the SAME
commit that first uses it, readers refuse tables requiring unknown
features, and ``ALTER TABLE DROP FEATURE`` downgrades once nothing
relies on the capability (reference behavior: delta-spark protocol
handling the reference inherits through every feature-gated API in
``src/delta_utils.py``)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from databricks_delta_lake_migration_spark.tables import Catalog
from databricks_delta_lake_migration_spark.tables.logtable import (
    LOG_DIR,
    LogTable,
    UnsupportedTableFeatureError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _mk(spark, tmp_path, name="t"):
    t = LogTable.create(spark, str(tmp_path / name), SCHEMA)
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], SCHEMA))
    return t


def test_features_stamped_on_first_use(spark, tmp_path):
    t = _mk(spark, tmp_path)
    d = t.detail()
    # legacy protocol until a feature is used
    assert d["tableFeatures"] == []
    assert (d["minReaderVersion"], d["minWriterVersion"]) == (1, 2)

    # writer-only feature: CDF enablement stamps it in that commit
    t.set_properties({"enableChangeDataFeed": "true"})
    d = t.detail()
    assert d["tableFeatures"] == ["changeDataFeed"]
    assert (d["minReaderVersion"], d["minWriterVersion"]) == (1, 7)

    # reader feature: the first DV delete upgrades the reader version
    t.set_properties({"enableDeletionVectors": "true"})
    t.delete("id = 2")
    d = t.detail()
    assert "deletionVectors" in d["tableFeatures"]
    assert (d["minReaderVersion"], d["minWriterVersion"]) == (3, 7)

    # column mapping rides on RENAME COLUMN
    t.rename_column("v", "val")
    assert "columnMapping" in t.detail()["tableFeatures"]

    # the stamp lands in the SAME commit as the enabling change, so
    # time travel to just before it sees the old protocol
    t0 = t.read(version=1)  # the initial append
    assert t0.count() == 3


def test_type_widening_is_a_reader_feature(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # an actual widening: long -> decimal
    t.alter_column_type("id", T.DecimalType(20, 0))
    d = t.detail()
    assert "typeWidening" in d["tableFeatures"]
    assert d["minReaderVersion"] == 3
    # and the feature can never be dropped (narrow files remain)
    with pytest.raises(ValueError, match="cannot be dropped"):
        t.drop_feature("typeWidening")


def test_unknown_feature_refuses_read_and_write(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.version() + 1
    # a newer engine lands a commit requiring a feature we don't know
    commit = {
        "version": v,
        "timestamp": 1.0,
        "operation": "SET TBLPROPERTIES",
        "add": [],
        "remove": [],
        "schema": None,
        "partitionBy": None,
        "properties": {"delta.feature.futureMagic": "supported"},
        "operationParameters": {},
        "operationMetrics": {},
    }
    with open(
        os.path.join(str(tmp_path / "t"), LOG_DIR, f"{v:020d}.json"), "w"
    ) as fh:
        json.dump(commit, fh)

    fresh = LogTable(spark, str(tmp_path / "t"))
    with pytest.raises(UnsupportedTableFeatureError, match="futureMagic"):
        fresh.read()
    with pytest.raises(UnsupportedTableFeatureError, match="futureMagic"):
        fresh.append(spark.createDataFrame([(9, 9.0)], SCHEMA))
    # time travel BELOW the poisoned commit still works
    assert fresh.read(version=v - 1).count() == 3


def test_drop_feature_lifecycle_and_sql(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    t = cat.create_table("lake.silver.t", SCHEMA)
    t.append(spark.createDataFrame([(i, float(i)) for i in range(8)], SCHEMA))

    t.set_properties({"enableDeletionVectors": "true"})
    t.delete("id = 3")
    assert "deletionVectors" in t.detail()["tableFeatures"]

    # still in use: the property is on and a DV exists
    with pytest.raises(ValueError, match="in use"):
        t.drop_feature("deletionVectors")
    t.set_properties({"enableDeletionVectors": "false"})
    with pytest.raises(ValueError, match="in use"):  # DV files remain
        t.drop_feature("deletionVectors")
    cat.sql("REORG TABLE silver.t APPLY (PURGE)")
    cat.sql("ALTER TABLE silver.t DROP FEATURE deletionVectors")

    d = t.detail()
    assert "deletionVectors" not in d["tableFeatures"]
    assert (d["minReaderVersion"], d["minWriterVersion"]) == (1, 2)
    assert t.read().count() == 7

    # dropping a feature that was never enabled is an error
    with pytest.raises(KeyError):
        t.drop_feature("rowTracking")

    # and a steady-state append after all this carries no protocol noise
    t.append(spark.createDataFrame([(100, 1.0)], SCHEMA))
    assert t.detail()["tableFeatures"] == []


def test_corrupt_commit_json_refuses_write(spark, tmp_path):
    """_stamp_protocol must not swallow a corrupt commit log
    (ADVICE r5): if the prior properties can't be read because a
    commit JSON is garbage, writing anyway would compute the effective
    feature set from the new commit alone — bypassing the
    unknown-feature gate. The write must fail loudly instead."""
    from databricks_delta_lake_migration_spark.tables import LogTable

    path = str(tmp_path / "t")
    t = LogTable.create(spark, path, SCHEMA)
    t.append(spark.createDataFrame([(1, 1.0)], SCHEMA))

    # corrupt v0's commit JSON in place
    v0 = os.path.join(path, "_log", f"{0:020d}.json")
    with open(v0, "w") as fh:
        fh.write("{ this is not json")

    fresh = LogTable(spark, path)
    with pytest.raises(Exception) as exc_info:
        fresh.append(spark.createDataFrame([(2, 2.0)], SCHEMA))
    assert isinstance(
        exc_info.value, (json.JSONDecodeError, ValueError, RuntimeError)
    )
