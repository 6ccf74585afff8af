"""Redis enrichment operators.

Reference surface: ``jd_get/jd_set2/jd_set5/jd_del/jd_mget/jd_mset``
UDTFs sharing one connection per task plus ``jd_keys`` pattern scan
(reference: hive-udfs/.../redis/JedisUDTF.java:24-90,
UDTFJedisGet.java:17-36, UDTFJedisKeys.java:20-49).

Spark-first: per-row operators run via ``mapInPandas`` with ONE client
per partition (opened before the first Arrow batch, closed in
``finally``) — the per-task amortization the reference built UDTFs
for. All input columns pass through (= the reference's ctx). ``jd_keys``
runs driver-side with SCAN (executor-side KEYS against one Redis is an
anti-pattern: n workers × full keyspace scans).

Clients are injected as a zero-arg picklable factory so the operators
are engine-testable without a server (see testing.fakeredis) and use
``redis-py`` in production (import-gated).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

ClientFactory = Callable[[], object]


def redis_client_factory(uri: str) -> ClientFactory:
    """Production factory: redis-py client from a URI (import-gated)."""

    def make():
        try:
            import redis  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "redis-py is required for real Redis access; operators also "
                "accept any factory returning a get/set/delete/mget/mset/scan client"
            ) from e
        return redis.Redis.from_url(uri, decode_responses=True)

    return make


def _map_with_client(
    df: DataFrame, out_fields: list[StructField], fn, client_factory: ClientFactory
) -> DataFrame:
    """Shared mapInPandas runner: per-partition client lifecycle +
    full input-column (ctx) passthrough."""
    out_schema = StructType(list(df.schema.fields) + out_fields)
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator) -> Iterator:
        client = client_factory()
        try:
            for pdf in batches:
                yield fn(client, pdf, in_cols)
        finally:
            close = getattr(client, "close", None)
            if close:
                close()

    return df.mapInPandas(run, schema=out_schema)


def jd_get(df: DataFrame, client_factory: ClientFactory, key_col: str = "k") -> DataFrame:
    """GET per row -> appends ``ret`` (null for missing keys)."""

    def fn(client, pdf, in_cols):
        pdf = pdf[in_cols].copy()
        pdf["ret"] = [client.get(k) for k in pdf[key_col]]
        return pdf

    return _map_with_client(df, [StructField("ret", StringType())], fn, client_factory)


def jd_mget(df: DataFrame, client_factory: ClientFactory, keys_col: str = "ks") -> DataFrame:
    """MGET per row over an array-of-keys column; fans out one output
    row PER VALUE (the reference forwards each mget element,
    UDTFJedisMultiGet.java:39)."""

    def fn(client, pdf, in_cols):
        import pandas as pd

        rows = []
        for _, row in pdf.iterrows():
            keys = list(row[keys_col])
            vals = client.mget(keys) if keys else []
            for k, v in zip(keys, vals):
                out = {c: row[c] for c in in_cols}
                out["key"], out["ret"] = k, v
                rows.append(out)
        return pd.DataFrame(rows, columns=in_cols + ["key", "ret"])

    return _map_with_client(
        df,
        [StructField("key", StringType()), StructField("ret", StringType())],
        fn,
        client_factory,
    )


def jd_set(
    df: DataFrame,
    client_factory: ClientFactory,
    key_col: str = "k",
    value_col: str = "v",
    nx: bool = False,
    xx: bool = False,
    ex_sec: int | None = None,
) -> DataFrame:
    """SET per row (plain = jd_set2; nx/xx/ex = jd_set5's NX/XX/EXPX
    arguments, reference: UDTFJedisSet5.java:14-41) -> appends ``ret``."""

    def fn(client, pdf, in_cols):
        pdf = pdf[in_cols].copy()
        rets = []
        for k, v in zip(pdf[key_col], pdf[value_col]):
            r = client.set(k, v, nx=nx, xx=xx, ex=ex_sec)
            rets.append("OK" if r in (True, "OK") else None)
        pdf["ret"] = rets
        return pdf

    return _map_with_client(df, [StructField("ret", StringType())], fn, client_factory)


def jd_del(df: DataFrame, client_factory: ClientFactory, key_col: str = "k") -> DataFrame:
    """DEL per row -> appends ``ret`` = number of keys removed."""

    def fn(client, pdf, in_cols):
        pdf = pdf[in_cols].copy()
        pdf["ret"] = [int(client.delete(k)) for k in pdf[key_col]]
        return pdf

    return _map_with_client(df, [StructField("ret", LongType())], fn, client_factory)


def jd_mset(df: DataFrame, client_factory: ClientFactory, map_col: str = "kv") -> DataFrame:
    """MSET per row over a map column -> appends ``ret``."""

    def fn(client, pdf, in_cols):
        pdf = pdf[in_cols].copy()
        rets = []
        for kv in pdf[map_col]:
            client.mset(dict(kv))
            rets.append("OK")
        pdf["ret"] = rets
        return pdf

    return _map_with_client(df, [StructField("ret", StringType())], fn, client_factory)


def jd_keys(
    spark: SparkSession, client_factory: ClientFactory, pattern: str = "*"
) -> DataFrame:
    """Pattern scan -> DataFrame of keys. Driver-side SCAN (cursor
    iteration), not KEYS, and not per-executor — one pass over the
    keyspace total."""
    client = client_factory()
    try:
        if hasattr(client, "scan_iter"):
            keys = sorted(client.scan_iter(match=pattern))
        else:
            keys = sorted(client.keys(pattern))
        return spark.createDataFrame([(k,) for k in keys], "key string")
    finally:
        close = getattr(client, "close", None)
        if close:
            close()
