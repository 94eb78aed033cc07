"""Oracle / Db2 / Cassandra-CQL schema-history replay (the incubator's
actual source dialects — reference README lists Oracle, Db2, Cassandra
connectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from debezium_incubator_spark.cdc.schema_history import (
    DialectContext,
    apply_ddl,
    parse_sql_type,
    replay_history,
)
from debezium_incubator_spark.cdc.schema_registry import SchemaRegistry


# --- Oracle ---------------------------------------------------------------

def test_oracle_types():
    cases = {
        "VARCHAR2(255)": T.StringType(),
        "NVARCHAR2(100)": T.StringType(),
        "CLOB": T.StringType(),
        "NCLOB": T.StringType(),
        "RAW(16)": T.BinaryType(),
        "LONG RAW": T.BinaryType(),
        "BINARY_FLOAT": T.FloatType(),
        "BINARY_DOUBLE": T.DoubleType(),
        "NUMBER(10,2)": T.DecimalType(10, 2),
        "NUMBER(10)": T.DecimalType(10, 0),
        "NUMBER": T.DecimalType(38, 10),
        "NUMBER(*,4)": T.DecimalType(38, 4),
        "FLOAT(126)": T.DoubleType(),
        "DATE": T.TimestampNTZType(),  # Oracle DATE carries time
        "TIMESTAMP(6)": T.TimestampNTZType(),
        "TIMESTAMP(6) WITH TIME ZONE": T.TimestampType(),
        "TIMESTAMP WITH LOCAL TIME ZONE": T.TimestampType(),
        "INTERVAL YEAR(2) TO MONTH": T.YearMonthIntervalType(),
        "INTERVAL DAY(3) TO SECOND(6)": T.DayTimeIntervalType(),
        "ROWID": T.StringType(),
        "XMLTYPE": T.StringType(),
    }
    for s, want in cases.items():
        assert parse_sql_type(s, "oracle") == want, s


def test_oracle_replay_with_parenthesized_alters():
    reg = replay_history(
        [
            """CREATE TABLE "HR"."EMPLOYEES" (
                 "ID" NUMBER(10) NOT NULL,
                 "NAME" VARCHAR2(100),
                 "SALARY" NUMBER(12,2),
                 "HIRED" DATE,
                 PRIMARY KEY ("ID"))""",
            'ALTER TABLE "HR"."EMPLOYEES" ADD ("BONUS" NUMBER(8,2), "NOTES" CLOB)',
            'ALTER TABLE "HR"."EMPLOYEES" MODIFY ("NAME" VARCHAR2(400))',
            'ALTER TABLE "HR"."EMPLOYEES" DROP ("NOTES", "HIRED")',
        ],
        dialect="oracle",
    )
    assert len(reg.versions["employees"]) == 4
    latest = reg.latest("employees")
    assert [f.name for f in latest.fields] == ["ID", "NAME", "SALARY", "BONUS"]
    assert latest["ID"].dataType == T.DecimalType(10, 0)
    assert not latest["ID"].nullable
    assert latest["BONUS"].dataType == T.DecimalType(8, 2)
    # v0 had DATE → timestamp_ntz
    assert reg.version("employees", 0)["HIRED"].dataType == T.TimestampNTZType()


# --- Db2 ------------------------------------------------------------------

def test_db2_types():
    cases = {
        "VARGRAPHIC(128)": T.StringType(),
        "GRAPHIC(10)": T.StringType(),
        "DBCLOB(1M)": T.StringType(),
        "DECFLOAT(34)": T.DoubleType(),
        "CHAR(16) FOR BIT DATA": T.BinaryType(),
        "VARCHAR(32) FOR BIT DATA": T.BinaryType(),
        "TIMESTAMP(12)": T.TimestampNTZType(),
    }
    for s, want in cases.items():
        assert parse_sql_type(s, "db2") == want, s


def test_db2_replay_set_data_type():
    reg = replay_history(
        [
            "CREATE TABLE DB2INST1.ORDERS (ID BIGINT NOT NULL, "
            "REF CHAR(16) FOR BIT DATA, AMT DECFLOAT(16))",
            "ALTER TABLE DB2INST1.ORDERS ALTER COLUMN AMT SET DATA TYPE DECIMAL(14,3)",
            "ALTER TABLE DB2INST1.ORDERS ADD COLUMN NOTE VARGRAPHIC(256)",
        ],
        dialect="db2",
    )
    latest = reg.latest("orders")
    assert latest["AMT"].dataType == T.DecimalType(14, 3)
    assert latest["REF"].dataType == T.BinaryType()
    assert latest["NOTE"].dataType == T.StringType()
    assert len(reg.versions["orders"]) == 3


# --- Cassandra CQL --------------------------------------------------------

def test_cql_scalar_and_collection_types():
    ctx = DialectContext(dialect="cassandra")
    p = lambda s: parse_sql_type(s, "cassandra", ctx.udts)  # noqa: E731
    assert p("text") == T.StringType()
    assert p("varint") == T.DecimalType(38, 0)
    # counters are delta-valued in the commitlog — capture is refused
    # (public Debezium Cassandra behavior), never silently mapped
    with pytest.raises(ValueError, match="counter columns are not CDC-able"):
        p("counter")
    assert p("timeuuid") == T.StringType()
    assert p("timestamp") == T.TimestampType()
    assert p("time") == T.LongType()
    assert p("list<double>") == T.ArrayType(T.DoubleType())
    assert p("set<text>") == T.ArrayType(T.StringType())
    assert p("map<text, int>") == T.MapType(T.StringType(), T.IntegerType())
    assert p("frozen<map<text, list<int>>>") == T.MapType(
        T.StringType(), T.ArrayType(T.IntegerType())
    )
    assert p("tuple<int, text>") == T.StructType(
        [
            T.StructField("_1", T.IntegerType(), True),
            T.StructField("_2", T.StringType(), True),
        ]
    )


def test_cql_create_table_with_clustering_tail():
    reg = replay_history(
        [
            """CREATE TABLE ks.readings (
                 sensor_id uuid,
                 ts timestamp,
                 value double,
                 tags map<text, text>,
                 samples list<frozen<list<double>>>,
                 PRIMARY KEY ((sensor_id), ts)
               ) WITH CLUSTERING ORDER BY (ts DESC)
                 AND compaction = {'class': 'SizeTieredCompactionStrategy'}""",
            "ALTER TABLE ks.readings ADD unit text",
            "ALTER TABLE ks.readings DROP tags",
            "ALTER TABLE ks.readings RENAME value TO reading",
        ],
        dialect="cassandra",
    )
    latest = reg.latest("readings")
    assert [f.name for f in latest.fields] == [
        "sensor_id", "ts", "reading", "samples", "unit",
    ]
    assert latest["samples"].dataType == T.ArrayType(
        T.ArrayType(T.DoubleType())
    )
    assert latest["ts"].dataType == T.TimestampType()


def test_cql_udt_create_and_alter_reversions_dependents():
    reg = SchemaRegistry()
    ctx = DialectContext(dialect="cassandra")
    apply_ddl(reg, "CREATE TYPE ks.address (street text, city text)", ctx)
    apply_ddl(
        reg,
        "CREATE TABLE ks.users (id uuid PRIMARY KEY, name text, "
        "addr frozen<address>, prev list<frozen<address>>)",
        ctx,
    )
    addr_v1 = T.StructType(
        [
            T.StructField("street", T.StringType(), True),
            T.StructField("city", T.StringType(), True),
        ]
    )
    assert reg.latest("users")["addr"].dataType == addr_v1
    assert reg.latest("users")["prev"].dataType == T.ArrayType(addr_v1)

    # ALTER TYPE must re-version every dependent table
    apply_ddl(reg, "ALTER TYPE ks.address ADD zip int", ctx)
    assert len(reg.versions["users"]) == 2
    addr_v2 = T.StructType(
        addr_v1.fields + [T.StructField("zip", T.IntegerType(), True)]
    )
    assert reg.latest("users")["addr"].dataType == addr_v2
    assert reg.latest("users")["prev"].dataType == T.ArrayType(addr_v2)

    apply_ddl(reg, "ALTER TYPE ks.address RENAME street TO st AND city TO town", ctx)
    assert [f.name for f in reg.latest("users")["addr"].dataType.fields] == [
        "st", "town", "zip",
    ]
    assert len(reg.versions["users"]) == 3


def test_cql_alter_unknown_type_raises():
    reg = SchemaRegistry()
    ctx = DialectContext(dialect="cassandra")
    with pytest.raises(ValueError, match="unknown type"):
        apply_ddl(reg, "ALTER TYPE ks.missing ADD x int", ctx)


def test_cql_upgrade_applies_nested_nulls(spark):
    """End-to-end: a UDT evolution replays into a registry whose
    upgrade() projects old-version rows to the new nested shape."""
    reg = SchemaRegistry()
    ctx = DialectContext(dialect="cassandra")
    apply_ddl(reg, "CREATE TYPE ks.point (x double, y double)", ctx)
    apply_ddl(
        reg,
        "CREATE TABLE ks.tracks (id bigint PRIMARY KEY, loc frozen<point>)",
        ctx,
    )
    old_schema = reg.latest("tracks")
    df_old = spark.createDataFrame([(1, (0.5, 1.5))], old_schema)
    apply_ddl(reg, "ALTER TYPE ks.point ADD z double", ctx)
    up = reg.upgrade(df_old, "tracks")
    assert up.schema == reg.latest("tracks")
    row = up.collect()[0]
    assert (row.loc.x, row.loc.y, row.loc.z) == (0.5, 1.5, None)


# --- dialect default stays backward-compatible ----------------------------

def test_generic_dialect_unchanged():
    reg = replay_history(
        [
            "CREATE TABLE t (id INT NOT NULL, d DATE, ts TIMESTAMP)",
        ]
    )
    latest = reg.latest("t")
    assert latest["d"].dataType == T.DateType()  # NOT Oracle semantics
    assert latest["ts"].dataType == T.TimestampNTZType()


# --- property-style round trips ------------------------------------------

_POOLS = {
    "generic": [
        ("INT", T.IntegerType()), ("BIGINT", T.LongType()),
        ("VARCHAR(40)", T.StringType()), ("DOUBLE", T.DoubleType()),
        ("BOOLEAN", T.BooleanType()), ("DATE", T.DateType()),
        ("DECIMAL(12,2)", T.DecimalType(12, 2)),
    ],
    "oracle": [
        ("NUMBER(10)", T.DecimalType(10, 0)),
        ("NUMBER(12,2)", T.DecimalType(12, 2)),
        ("VARCHAR2(100)", T.StringType()),
        ("BINARY_DOUBLE", T.DoubleType()),
        ("CLOB", T.StringType()), ("RAW(16)", T.BinaryType()),
    ],
    "cassandra": [
        ("int", T.IntegerType()), ("bigint", T.LongType()),
        ("text", T.StringType()), ("double", T.DoubleType()),
        ("list<int>", T.ArrayType(T.IntegerType())),
        ("map<text, double>", T.MapType(T.StringType(), T.DoubleType())),
        ("frozen<set<text>>", T.ArrayType(T.StringType())),
    ],
}
_QUOTE = {"generic": "`{}`", "oracle": '"{}"', "cassandra": '"{}"'}
# keyword-colliding names MUST survive when quoted
_NAMES = ["key", "index", "check", "c0", "c1", "value_2", "x"]


def test_random_schema_roundtrip_all_dialects():
    import random

    for dialect, pool in _POOLS.items():
        for seed in range(10):
            rng = random.Random(seed)
            cols = rng.sample(_NAMES, rng.randrange(2, len(_NAMES)))
            defs = [(n, *rng.choice(pool)) for n in cols]
            qf = _QUOTE[dialect].format
            body = ", ".join(f"{qf(n)} {t}" for n, t, _ in defs)
            body += f", PRIMARY KEY ({qf(defs[0][0])})"
            reg = SchemaRegistry()
            ctx = DialectContext(dialect=dialect)
            apply_ddl(reg, f"CREATE TABLE ks.t ({body})", ctx)
            got = reg.latest("t")
            assert [f.name for f in got.fields] == [n for n, _, _ in defs], (
                dialect, seed)
            for (n, tstr, want) in defs:
                assert got[n].dataType == want, (dialect, seed, n, tstr)

            # ALTER: drop one, add one, rename one — order preserved
            victim = defs[-1][0]
            keep = [d for d in defs if d[0] != victim]
            apply_ddl(reg, f"ALTER TABLE t DROP COLUMN {qf(victim)}", ctx)
            newt, newty = rng.choice(pool)
            apply_ddl(reg, f"ALTER TABLE t ADD {qf('added')} {newt}", ctx)
            first = keep[0][0] if keep else "added"
            apply_ddl(
                reg, f"ALTER TABLE t RENAME COLUMN {qf(first)} TO {qf('renamed')}",
                ctx,
            )
            got = reg.latest("t")
            want_names = ["renamed"] + [n for n, _, _ in keep[1:]] + ["added"]
            assert [f.name for f in got.fields] == want_names, (dialect, seed)
            assert got["added"].dataType == newty
            assert len(reg.versions["t"]) == 4


# --- Oracle LOB capture semantics (lob.enabled=false placeholder) ---------

def test_oracle_lob_ddl_and_placeholder_resolution(spark):
    """End-to-end LOB story: an Oracle CREATE TABLE with CLOB/BLOB
    columns replays into the registry as string/binary, and a change
    stream whose updates carry the unavailable-value placeholder
    resolves to each key's last real LOB write — including inheritance
    of an explicit NULL write (the struct-wrapper distinction)."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.cdc.materialize import (
        UNAVAILABLE_VALUE,
        resolve_unavailable,
    )

    reg = SchemaRegistry()
    ctx = DialectContext(dialect="oracle")
    apply_ddl(
        reg,
        "CREATE TABLE docs (id NUMBER(10), body CLOB, img BLOB)",
        ctx,
    )
    schema = reg.latest("docs")
    assert schema["body"].dataType == T.StringType()
    assert schema["img"].dataType == T.BinaryType()

    ph = UNAVAILABLE_VALUE
    rows = [
        # key 1: create -> placeholder update -> inherits the create body
        (1, 1, "v1", "c"),
        (1, 2, ph, "u"),
        # key 2: create -> explicit NULL write -> placeholder: stays NULL
        (2, 1, "v1", "c"),
        (2, 2, None, "u"),
        (2, 3, ph, "u"),
        # key 3: placeholder FIRST (update before any captured body):
        # resolves to NULL, not an invented value
        (3, 1, ph, "u"),
    ]
    df = spark.createDataFrame(rows, "id LONG, pos LONG, body STRING, __op STRING")
    from pyspark.sql.window import Window as W

    resolved = resolve_unavailable(
        df, keys=["id"], position=["pos"], lob_cols=["body"]
    ).withColumn("mx", F.max("pos").over(W.partitionBy("id")))
    got = {
        r.id: r.body for r in resolved.filter(F.col("pos") == F.col("mx")).collect()
    }
    assert got == {1: "v1", 2: None, 3: None}


def test_blob_placeholder_resolution_binary_typed(spark):
    """BLOB leg of the LOB story: the placeholder arrives as UTF-8
    bytes in a BINARY column; resolution must compare in binary (no
    implicit casts) and inherit the last real byte payload."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from debezium_incubator_spark.cdc.materialize import (
        UNAVAILABLE_VALUE,
        resolve_unavailable,
    )

    ph = UNAVAILABLE_VALUE.encode("utf-8")
    rows = [
        (1, 1, b"\x00\x01\xff", "c"),
        (1, 2, ph, "u"),              # inherits the binary payload
        (2, 1, ph, "u"),              # no prior capture -> NULL
    ]
    df = spark.createDataFrame(rows, "id LONG, pos LONG, img BINARY, __op STRING")
    resolved = resolve_unavailable(
        df, keys=["id"], position=["pos"], lob_cols=["img"]
    ).withColumn("mx", F.max("pos").over(W.partitionBy("id")))
    got = {
        r.id: (bytes(r.img) if r.img is not None else None)
        for r in resolved.filter(F.col("pos") == F.col("mx")).collect()
    }
    assert got == {1: b"\x00\x01\xff", 2: None}


# --- SQL Server (T-SQL) ---------------------------------------------------

def test_sqlserver_types():
    cases = {
        "NVARCHAR(100)": T.StringType(),
        "NVARCHAR(MAX)": T.StringType(),
        "NTEXT": T.StringType(),
        "UNIQUEIDENTIFIER": T.StringType(),
        "SQL_VARIANT": T.StringType(),
        "DATETIME2(7)": T.TimestampNTZType(),
        "SMALLDATETIME": T.TimestampNTZType(),
        "DATETIMEOFFSET(3)": T.TimestampType(),
        "MONEY": T.DecimalType(19, 4),
        "SMALLMONEY": T.DecimalType(10, 4),
        "VARBINARY(MAX)": T.BinaryType(),
        "IMAGE": T.BinaryType(),
        "ROWVERSION": T.BinaryType(),
        "TIMESTAMP": T.BinaryType(),   # T-SQL TIMESTAMP IS rowversion
        "TINYINT": T.ShortType(),      # unsigned 0-255 → int16
        "FLOAT": T.DoubleType(),       # defaults to float(53)
        "REAL": T.FloatType(),
        "BIT": T.BooleanType(),
        "HIERARCHYID": T.BinaryType(),
    }
    for s, want in cases.items():
        assert parse_sql_type(s, "sqlserver") == want, s
    # the same TIMESTAMP spelling stays a timestamp everywhere else
    assert parse_sql_type("TIMESTAMP", "generic") == T.TimestampNTZType()


def test_sqlserver_replay_bracketed_identifiers_and_alter_column():
    reg = replay_history(
        [
            "CREATE TABLE [dbo].[Order Details] ("
            "[id] INT IDENTITY(1,1) NOT NULL, "
            "[unit price] MONEY, "
            "[row ver] ROWVERSION, "
            "[note] NVARCHAR(255), "
            "[placed] DATETIME2(7), "
            "CONSTRAINT [PK_od] PRIMARY KEY ([id]))",
            "ALTER TABLE [dbo].[Order Details] ALTER COLUMN [note] NVARCHAR(MAX) NOT NULL",
            "ALTER TABLE [dbo].[Order Details] ADD [guid] UNIQUEIDENTIFIER",
            "ALTER TABLE [dbo].[Order Details] DROP COLUMN [row ver]",
        ],
        dialect="sqlserver",
    )
    latest = reg.latest("order details")
    assert latest["id"].dataType == T.IntegerType()
    assert not latest["id"].nullable
    assert latest["unit price"].dataType == T.DecimalType(19, 4)
    assert latest["note"].dataType == T.StringType()
    assert not latest["note"].nullable  # ALTER COLUMN retype + NOT NULL
    assert latest["placed"].dataType == T.TimestampNTZType()
    assert latest["guid"].dataType == T.StringType()
    assert "row ver" not in latest.fieldNames()
    assert len(reg.versions["order details"]) == 4
