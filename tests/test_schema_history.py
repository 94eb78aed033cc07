"""DDL schema-history replay: Debezium-style DDL strings → versioned
StructTypes → distributed normalization of old-version data."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_incubator_spark.cdc.schema_history import (
    apply_ddl,
    parse_sql_type,
    replay_history,
    replay_history_df,
)
from debezium_incubator_spark.cdc.schema_registry import SchemaRegistry


def test_parse_sql_types():
    assert parse_sql_type("INT") == T.IntegerType()
    assert parse_sql_type("int unsigned") == T.LongType()
    assert parse_sql_type("BIGINT") == T.LongType()
    assert parse_sql_type("VARCHAR(255)") == T.StringType()
    assert parse_sql_type("DECIMAL(12,2)") == T.DecimalType(12, 2)
    assert parse_sql_type("NUMERIC") == T.DecimalType(10, 0)
    assert parse_sql_type("double precision") == T.DoubleType()
    assert parse_sql_type("TINYINT(1)") == T.BooleanType()
    assert parse_sql_type("DATETIME") == T.TimestampNTZType()
    assert parse_sql_type("BLOB") == T.BinaryType()
    assert parse_sql_type("some_exotic_udt") == T.StringType()


def test_create_table_with_constraints():
    reg = SchemaRegistry()
    apply_ddl(reg, """
        CREATE TABLE `inventory`.`customers` (
          `id` INT UNSIGNED NOT NULL,
          `first_name` VARCHAR(255) NOT NULL,
          `email` VARCHAR(255),
          `balance` DECIMAL(10,2),
          `created_at` DATETIME NOT NULL,
          PRIMARY KEY (`id`),
          UNIQUE KEY `email_uk` (`email`),
          CONSTRAINT fk FOREIGN KEY (id) REFERENCES other(id)
        ) ENGINE=InnoDB
    """)
    s = reg.latest("customers")
    assert [f.name for f in s.fields] == [
        "id", "first_name", "email", "balance", "created_at",
    ]
    assert s["id"].dataType == T.LongType()  # unsigned INT widens
    assert not s["id"].nullable
    assert s["email"].nullable
    assert s["balance"].dataType == T.DecimalType(10, 2)


def test_alter_evolution_chain():
    reg = replay_history([
        "CREATE TABLE t (id INT NOT NULL, name VARCHAR(50))",
        "ALTER TABLE t ADD COLUMN score DOUBLE",
        "ALTER TABLE t DROP COLUMN name",
        "ALTER TABLE t RENAME COLUMN score TO rating",
        "ALTER TABLE t MODIFY COLUMN rating DECIMAL(6,3)",
        "ALTER TABLE t ALTER COLUMN id SET DATA TYPE BIGINT",
        "ALTER TABLE t ADD INDEX idx_id (id)",  # shape no-op
        "GRANT SELECT ON t TO someone",          # ignored
    ])
    assert len(reg.versions["t"]) == 6  # create + 5 mutating alters
    s = reg.latest("t")
    assert [(f.name, f.dataType) for f in s.fields] == [
        ("id", T.LongType()),
        ("rating", T.DecimalType(6, 3)),
    ]


def test_mysql_change_and_multi_clause():
    reg = replay_history([
        "CREATE TABLE p (a INT, b VARCHAR(10))",
        "ALTER TABLE p CHANGE COLUMN a a_id BIGINT NOT NULL, ADD c DATE",
    ])
    s = reg.latest("p")
    assert [f.name for f in s.fields] == ["a_id", "b", "c"]
    assert s["a_id"].dataType == T.LongType()
    assert not s["a_id"].nullable
    assert s["c"].dataType == T.DateType()


def test_rename_and_drop_table():
    reg = replay_history([
        "CREATE TABLE old_name (x INT)",
        "RENAME TABLE old_name TO new_name",
        "CREATE TABLE gone (y INT)",
        "DROP TABLE gone",
    ])
    assert "new_name" in reg.versions
    assert "old_name" not in reg.versions
    assert "gone" not in reg.versions


def test_replay_then_upgrade_old_version_data(spark):
    """The end-to-end path: replay history, then normalize a DataFrame
    captured under the ORIGINAL schema to the latest version (added
    column → typed null, retyped column → cast)."""
    reg = replay_history([
        "CREATE TABLE users (id INT NOT NULL, city VARCHAR(40))",
        "ALTER TABLE users ADD COLUMN signup DATE",
        "ALTER TABLE users MODIFY COLUMN id BIGINT",
    ])
    old = spark.createDataFrame(
        [(1, "oslo"), (2, "lima")],
        T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("city", T.StringType()),
        ]),
    )
    up = reg.upgrade(old, "users")
    assert [f.name for f in up.schema.fields] == ["id", "city", "signup"]
    assert dict(up.dtypes)["id"] == "bigint"
    assert dict(up.dtypes)["signup"] == "date"
    rows = up.orderBy("id").collect()
    assert rows[0].signup is None and rows[0].id == 1


def test_replay_history_df(spark):
    """Schema-history topic replay from a DataFrame of DDL events (the
    Debezium history-topic shape: position + ddl string)."""
    hist = spark.createDataFrame(
        [
            (1, "CREATE TABLE acct (id INT, bal DECIMAL(10,2))"),
            (2, "ALTER TABLE acct ADD COLUMN status VARCHAR(8)"),
            (3, None),
        ],
        "pos INT, ddl STRING",
    ).orderBy("pos")
    reg = replay_history_df(hist)
    assert [f.name for f in reg.latest("acct").fields] == ["id", "bal", "status"]


def test_quoted_keyword_columns_are_kept():
    """Backticked/quoted identifiers that collide with constraint
    keywords (`key`, `index`, "check") are COLUMNS — Debezium's MySQL
    history quotes every identifier, so dropping them silently corrupts
    every downstream decode (round-2 ADVICE item)."""
    reg = replay_history([
        'CREATE TABLE kv (`key` INT NOT NULL, `index` VARCHAR(10), '
        '"check" BOOLEAN, id BIGINT, PRIMARY KEY (`key`))',
        "ALTER TABLE kv ADD COLUMN `constraint` DATE",
        "ALTER TABLE kv DROP COLUMN `index`",
    ])
    s = reg.latest("kv")
    assert [f.name for f in s.fields] == ["key", "check", "id", "constraint"]
    assert s["key"].dataType == T.IntegerType()
    assert not s["key"].nullable
    assert s["constraint"].dataType == T.DateType()
    # bare keywords are still constraints, not columns
    reg2 = replay_history([
        "CREATE TABLE t2 (id INT, KEY idx (id), INDEX idx2 (id))",
        "ALTER TABLE t2 ADD UNIQUE KEY uk (id)",
    ])
    assert [f.name for f in reg2.latest("t2").fields] == ["id"]


def test_schema_change_topic_events(spark):
    """`include.schema.changes=true` twin: one typed event per
    shape-mutating DDL with the structured post-statement table shape
    (Debezium's tableChanges payload). Shape-irrelevant statements emit
    nothing; the last event's columns equal the registry's final schema
    (consumers never re-parse DDL); the wire render targets the
    topic.prefix topic with a parseable JSON value."""
    import json

    from debezium_incubator_spark.cdc.schema_history import (
        SchemaRegistry,
        schema_change_events,
        schema_change_wire,
    )

    reg = SchemaRegistry()
    ddls = [
        "CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(40))",
        "GRANT SELECT ON users TO analyst",          # no event
        "ALTER TABLE users ADD COLUMN email VARCHAR(80)",
        "CREATE TABLE audit (id BIGINT, what VARCHAR(10))",
        "DROP TABLE audit",
    ]
    ev = schema_change_events(spark, ddls, database="inventory",
                              registry=reg)
    rows = ev.orderBy("pos").collect()
    assert [(r.change_type, r.table_id) for r in rows] == [
        ("CREATE", "inventory.users"),
        ("ALTER", "inventory.users"),
        ("CREATE", "inventory.audit"),
        ("DROP", "inventory.audit"),
    ]
    # GRANT emitted nothing and positions are the DDL-stream indexes
    assert [r.pos for r in rows] == [0, 2, 3, 4]
    # structured shape matches the replayed registry, orderly positions
    alter = rows[1]
    assert [(c.name, c.position) for c in alter.columns] == [
        ("id", 1), ("name", 2), ("email", 3)
    ]
    assert [c.name for c in alter.columns] == [
        f.name for f in reg.latest("users").fields
    ]
    assert alter.columns[0].optional is False  # NOT NULL carried
    assert rows[3].columns is None             # DROP has no shape

    wire = schema_change_wire(ev, "srv1").collect()
    assert {r.topic for r in wire} == {"srv1"}
    v = json.loads(wire[0].value)
    assert v["databaseName"] == "inventory"
    assert v["tableChanges"]["type"] == "CREATE"
    assert [c["name"] for c in v["tableChanges"]["table"]["columns"]] == [
        "id", "name"
    ]


def test_schema_change_events_rename_classified_alter(spark):
    """RENAME emits an ALTER under the NEW table id (the old id's
    versions move wholesale) — the consumer contract Debezium documents
    for table renames in the schema-change stream."""
    from debezium_incubator_spark.cdc.schema_history import (
        schema_change_events,
    )

    ev = schema_change_events(spark, [
        "CREATE TABLE a (id BIGINT)",
        "ALTER TABLE a RENAME TO b",
    ], database="db")
    rows = ev.orderBy("pos").collect()
    assert [(r.change_type, r.table_id) for r in rows] == [
        ("CREATE", "db.a"), ("ALTER", "db.b"),
    ]
    assert [c.name for c in rows[1].columns] == ["id"]


def test_replay_history_captured_tables_and_skip_unparseable():
    """schema.history.internal.store.only.captured.tables.ddl keeps the
    registry blind to uncaptured tables (and CREATE TYPE statements,
    which target no table, always apply); skip.unparseable.ddl turns a
    replay-stopping statement into a skip — opt-in, default raises."""
    import pytest as _pytest

    from debezium_incubator_spark.cdc.schema_history import replay_history

    ddl = [
        "CREATE TABLE keep_me (id INT, v DOUBLE)",
        "CREATE TABLE noise (id INT)",
        "ALTER TABLE keep_me ADD COLUMN w TEXT",
        "ALTER TABLE noise ADD COLUMN x INT",
    ]
    reg = replay_history(ddl, captured_tables=["keep_me"])
    assert [f.name for f in reg.latest("keep_me").fields] == ["id", "v", "w"]
    with _pytest.raises(KeyError):
        reg.latest("noise")

    # an ALTER against a table the history never created stops the
    # replay by default (a parse-tier rejection: the statement can't be
    # interpreted against the known model)...
    from debezium_incubator_spark.cdc.schema_history import (
        UnparseableDDLError,
    )

    broken = ["CREATE TABLE t (id INT)",
              "ALTER TABLE ghost ADD COLUMN x INT",
              "ALTER TABLE t ADD COLUMN y INT"]
    with _pytest.raises(UnparseableDDLError):
        replay_history(broken)
    # ...and is skipped (later statements still apply) when opted in
    reg2 = replay_history(broken, skip_unparseable=True)
    assert [f.name for f in reg2.latest("t").fields] == ["id", "y"]


def test_skip_unparseable_never_swallows_semantic_refusals():
    """skip.unparseable.ddl skips PARSE rejections only — the CQL
    counter refusal and a rename whose source the registry never saw
    are deliberate engine decisions and must surface even with the
    flag set (round-7 ADVICE: they used to vanish silently)."""
    import pytest as _pytest

    from debezium_incubator_spark.cdc.schema_history import replay_history

    with _pytest.raises(ValueError, match="counter columns are not CDC-able"):
        replay_history(
            ["CREATE TABLE hits (pk int PRIMARY KEY, n counter)"],
            dialect="cassandra",
            skip_unparseable=True,
        )
    with _pytest.raises(ValueError, match="RENAME of unknown table"):
        replay_history(
            ["RENAME TABLE ghost TO phantom"],
            skip_unparseable=True,
        )


def test_rename_into_captured_table_is_not_silently_dropped():
    """Round-7 ADVICE (medium): ddl_target_tables must report BOTH
    sides of a rename for both spellings, so captured_tables filtering
    applies the statement when either side is captured; a rename whose
    source was filtered out raises loudly instead of KeyErroring or
    vanishing."""
    import pytest as _pytest

    from debezium_incubator_spark.cdc.schema_history import (
        ddl_target_tables, replay_history,
    )

    assert ddl_target_tables("RENAME TABLE a TO b") == {"a", "b"}
    assert ddl_target_tables("ALTER TABLE a RENAME TO b") == {"a", "b"}
    assert ddl_target_tables("ALTER TABLE a ADD COLUMN x INT") == {"a"}

    # rename OUT of a captured table into an uncaptured name applies
    # (the captured table's history keeps tracking it under the new id)
    reg = replay_history(
        ["CREATE TABLE a (id INT)", "ALTER TABLE a RENAME TO b"],
        captured_tables=["a"],
    )
    assert [f.name for f in reg.latest("b").fields] == ["id"]

    # rename INTO a captured table from an uncaptured source: the
    # source's CREATE was filtered, so the rename cannot be interpreted
    # — loud error, not a silent drop or a bare KeyError
    with _pytest.raises(ValueError, match="RENAME of unknown table"):
        replay_history(
            ["CREATE TABLE src (id INT)", "RENAME TABLE src TO dst"],
            captured_tables=["dst"],
        )


def test_cql_counter_table_refused_at_create():
    import pytest as _pytest

    from debezium_incubator_spark.cdc.schema_history import replay_history

    with _pytest.raises(ValueError, match="counter columns are not CDC-able"):
        replay_history(
            ["CREATE TABLE hits (pk int PRIMARY KEY, n counter)"],
            dialect="cassandra",
        )
