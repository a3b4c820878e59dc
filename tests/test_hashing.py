"""Pure-Python xxhash64 ↔ Spark F.xxhash64 bit-parity (SURVEY §7 hard part d)."""

from pyspark.sql import functions as F

from elasticsearch_data_import_handler_spark.functions.hashing import xxhash64, xxhash64_str


def test_xxhash64_spark_parity(spark):
    samples = [
        "", "a", "abc", "1234567", "12345678", "0123456789abcdef",
        "https://host7.example/p/12345", "doc://src3/42",
        "x" * 31, "x" * 32, "x" * 33, "x" * 100, "héllo wörld ünïcode ☃",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == xxhash64_str(s), f"mismatch for {s!r}"


def test_xxhash64_bytes_parity(spark):
    samples = [b"", b"\x00", b"\xff" * 40, bytes(range(256))]
    df = spark.createDataFrame([(s,) for s in samples], "b binary")
    got = [r["h"] for r in df.select(F.xxhash64("b").alias("h")).collect()]
    for s, h in zip(samples, got):
        assert h == xxhash64(s), f"mismatch for {s!r}"
