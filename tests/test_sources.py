"""Table-source loading, in particular timestamp-flavor normalization.

Round-3 regression (VERDICT.md r3): the driver's testdata switched from
parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) with isAdjustedToUTC=false
(the pandas default), which Spark loads as TIMESTAMP_NTZ.  Every
event-time expression (``unix_micros``, ``ts.cast("double")``) is an
AnalysisException on NTZ, so 11 operators broke while the synthetic-LTZ
test suite stayed green.  These tests write a micros-NTZ parquet exactly
like the driver's and run one operator from each family that broke.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from eventkit_spark.operators.relational import asof_join
from eventkit_spark.sources.tables import load_events, load_table


@pytest.fixture(scope="module")
def ntz_dir(tmp_path_factory):
    """A testdata-shaped events.parquet with naive micros timestamps."""
    d = tmp_path_factory.mktemp("ntz")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = 12
    table = pa.table(
        {
            "event_id": pa.array(range(rows), pa.int64()),
            # bursts: 3 rows 0.1s apart, then a 30s gap, per user
            "ts": pa.array(
                [
                    base
                    + dt.timedelta(seconds=(i // 6) * 1000 + (i % 6 // 3) * 30 + (i % 3) * 0.1)
                    for i in range(rows)
                ],
                pa.timestamp("us"),  # no tz => isAdjustedToUTC=false => NTZ
            ),
            "user_id": pa.array([i // 6 for i in range(rows)], pa.int64()),
            "value": pa.array([float(i) for i in range(rows)], pa.float64()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def test_load_events_ntz_parquet(spark, ntz_dir):
    """NTZ parquet loads as plain TIMESTAMP (LTZ, session tz UTC)."""
    df = load_table(spark, ntz_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # value-preserving under UTC: epoch micros of 2024-01-01T00:00:00
    first = df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).first()
    assert first["us"] == 1704067200000000


def test_ntz_timing_family(spark, ntz_dir):
    """delay / timeout / debounce over an NTZ-sourced stream."""
    ef = load_events(spark, ntz_dir)
    delayed = ef.delay(2.5)
    t0 = delayed.df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).first()
    assert t0["us"] == 1704067200000000 + 2_500_000
    # timeout 5s cuts each user's stream at the 30s gap: 3 rows survive
    cut = ef.timeout(5.0)
    assert cut.df.count() == 6  # 3 per user
    # debounce(first) with 1s: only burst heads survive
    heads = ef.debounce(1.0, on_first=True)
    assert heads.df.count() == 4  # 2 bursts per user
    # debounce(last) re-stamps the burst tails
    tails = ef.debounce(1.0)
    assert tails.df.count() == 4
    # timestamp() surfaces ts as double seconds
    stamped = ef.timestamp()
    row = stamped.df.orderBy("event_id").first()
    assert abs(row["t"] - 1704067200.0) < 1e-6


def test_ntz_emap_family(spark, ntz_dir):
    """mergemap over an NTZ-sourced stream (the _explode_children path)."""
    ef = load_events(spark, ntz_dir)
    small = ef._with(df=ef.df.filter(F.col("event_id") < 2))

    def gen(v):
        return F.array(
            F.struct(F.lit(0.0).alias("dt"), (v * 10).alias("value")),
            F.struct(F.lit(0.5).alias("dt"), (v * 10 + 1).alias("value")),
        )

    out = small.mergemap(gen)
    assert out.df.count() == 4
    assert isinstance(out.df.schema["ts"].dataType, TimestampType)


def test_ntz_asof_join_both_variants(spark, ntz_dir):
    """asof_join accepts NTZ inputs directly (entry normalization)."""
    # read raw to keep NTZ on purpose: bypass load_table normalization
    raw = spark.read.parquet(os.path.join(ntz_dir, "events.parquet"))
    left = raw.select("event_id", "ts", "user_id", "value")
    right = raw.filter(F.col("event_id") % 2 == 0).select(
        "ts", "user_id", (F.col("value") * 100).alias("quote")
    )
    keyed = asof_join(left, right, "ts", by="user_id")
    assert keyed.count() == left.count()
    # every left row at/after a right row carries the latest quote
    got = {r["event_id"]: r["quote"] for r in keyed.collect()}
    assert got[1] == 0.0 and got[3] == 200.0
    unkeyed = asof_join(left.drop("user_id"), right.drop("user_id"), "ts")
    assert unkeyed.count() == left.count()


def test_real_testdata_still_loads(spark):
    """Whatever flavor the driver's current testdata uses, it loads LTZ."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.exists(os.path.join(sf, "events.parquet")):
        pytest.skip("driver testdata not present")
    ef = load_events(spark, sf)
    assert isinstance(ef.df.schema["ts"].dataType, TimestampType)
    # one representative op from the broken family end-to-end
    assert ef.delay(1.0).df.limit(5).count() == 5


def test_webdataset_roundtrip(spark, tmp_path):
    """write_webdataset -> load_webdataset reproduces every sample's
    parts byte-for-byte, rolls shards at samples_per_shard, and the
    reader needs no shuffle (samples group inside the tar kernel)."""
    from eventkit_spark.sources.formats import load_webdataset, write_webdataset

    rows = [
        (f"{i:05d}", {"txt": f"doc number {i}".encode(),
                      "json": b'{"lang": "en"}',
                      "bin": bytes([i % 256, 255 - i % 256])})
        for i in range(37)
    ]
    df = spark.createDataFrame(rows, "key string, parts map<string, binary>")
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df.repartition(2), out, samples_per_shard=10
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == 37
    assert all(m["n_samples"] <= 10 for m in manifest)

    back = load_webdataset(spark, out)
    got = {r["key"]: dict(r["parts"]) for r in back.collect()}
    exp = {k: p for k, p in rows}
    assert got.keys() == exp.keys()
    for k in exp:
        assert {e: bytes(b) for e, b in got[k].items()} == exp[k], k

    from eventkit_spark.plans.audit import plan_report

    assert plan_report(back)["exchanges"] == 0


def test_webdataset_dotted_directory_keys(spark, tmp_path):
    """The sample key splits at the first dot of the BASENAME (upstream
    webdataset rule): members under a dotted directory ('v1.0/...') must
    keep the directory in the key and not bleed it into the extension."""
    import io
    import tarfile

    from eventkit_spark.sources.formats import load_webdataset

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in [
            ("v1.0/00001.txt", b"alpha"),
            ("v1.0/00001.meta.json", b"{}"),
            ("v1.0/00002.txt", b"beta"),
            ("plain", b"noext"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    shard = tmp_path / "dotted-000.tar"
    shard.write_bytes(buf.getvalue())

    got = {
        r["key"]: dict(r["parts"])
        for r in load_webdataset(spark, str(shard)).collect()
    }
    assert set(got) == {"v1.0/00001", "v1.0/00002", "plain"}
    # first-dot-of-basename: the SECOND dot stays in the extension
    assert {e: bytes(b) for e, b in got["v1.0/00001"].items()} == {
        "txt": b"alpha",
        "meta.json": b"{}",
    }
    assert {e: bytes(b) for e, b in got["plain"].items()} == {"": b"noext"}
