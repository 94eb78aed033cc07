"""DDL-string schema-history consumption (SURVEY.md §1.1, §2A A9).

Debezium's schema-history topic records the source database's DDL
statements so log events can be decoded against the schema current at
their log position [/root/reference/README.md:13 — the connectors
capture schema changes alongside row changes]. This module is the
consumer half for Spark: parse the common relational DDL subset
(MySQL/Postgres-flavored, as Debezium emits it) into Spark
``StructType`` evolution steps and replay a history stream into the
versioned :class:`~.schema_registry.SchemaRegistry`.

Supported statements (case-insensitive; quoted/backticked identifiers):

- ``CREATE TABLE t (col TYPE [NOT NULL] ..., PRIMARY KEY (...), ...)``
- ``ALTER TABLE t ADD [COLUMN] c TYPE``
- ``ALTER TABLE t DROP [COLUMN] c``
- ``ALTER TABLE t RENAME COLUMN a TO b``
- ``ALTER TABLE t MODIFY [COLUMN] c TYPE``          (MySQL)
- ``ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE TYPE``  (Postgres)
- ``ALTER TABLE t CHANGE [COLUMN] old new TYPE``    (MySQL rename+retype)
- ``DROP TABLE t`` / ``TRUNCATE TABLE t`` (history no-op for shape)
- ``RENAME TABLE a TO b`` / ``ALTER TABLE a RENAME TO b``

Scale: DDL replay is control-plane — a schema-history topic holds
thousands of statements, not billions; parsing happens once on the
driver and the result is a per-version ``StructType`` that the
distributed normalizing reader (``SchemaRegistry.upgrade``) applies as
a plain projection, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from .schema_registry import SchemaRegistry

# --- identifier / type lexing --------------------------------------------

_IDENT = r"(?:`([^`]+)`|\"([^\"]+)\"|\[([^\]]+)\]|([A-Za-z_][A-Za-z0-9_$]*))"


def _ident(m_groups: tuple) -> str:
    return next(g for g in m_groups if g is not None)


def _strip_ident(tok: str) -> str:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] in "`\"[" and tok[-1] in "`\"]":
        return tok[1:-1]
    return tok


# SQL type → Spark type. Sized strings collapse to StringType (Spark has
# no length-parameterized strings); DECIMAL keeps precision/scale.
_TYPE_MAP: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "MEDIUMINT": T.IntegerType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "SERIAL": T.IntegerType(),
    "BIGINT": T.LongType(),
    "BIGSERIAL": T.LongType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "DATE": T.DateType(),
    "DATETIME": T.TimestampNTZType(),
    "TIMESTAMP": T.TimestampNTZType(),
    "TIMESTAMPTZ": T.TimestampType(),
    "TIME": T.StringType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "TINYTEXT": T.StringType(),
    "MEDIUMTEXT": T.StringType(),
    "LONGTEXT": T.StringType(),
    "JSON": T.StringType(),
    "JSONB": T.StringType(),
    "XML": T.StringType(),
    "UUID": T.StringType(),
    "ENUM": T.StringType(),
    "SET": T.StringType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "BLOB": T.BinaryType(),
    "TINYBLOB": T.BinaryType(),
    "MEDIUMBLOB": T.BinaryType(),
    "LONGBLOB": T.BinaryType(),
    "BYTEA": T.BinaryType(),
}


def parse_sql_type(type_str: str) -> T.DataType:
    """Map one SQL column type (``DECIMAL(12,2)``, ``varchar(255)``,
    ``double precision``, ``int unsigned``…) to a Spark type."""
    s = type_str.strip().upper()
    s = re.sub(r"\s+", " ", s)
    m = re.match(r"([A-Z]+)(?:\s+PRECISION)?(?:\s*\(([^)]*)\))?", s)
    if not m:
        raise ValueError(f"unparseable SQL type: {type_str!r}")
    base, args = m.group(1), m.group(2)
    unsigned = " UNSIGNED" in s
    if base in ("DECIMAL", "NUMERIC", "DEC"):
        if args:
            parts = [int(p.strip()) for p in args.split(",")]
            prec, scale = parts[0], parts[1] if len(parts) > 1 else 0
        else:
            prec, scale = 10, 0
        return T.DecimalType(prec, scale)
    if base == "BIT":
        return T.BooleanType() if (args or "1") == "1" else T.BinaryType()
    if base == "TINYINT" and args == "1":
        return T.BooleanType()  # MySQL bool convention
    t = _TYPE_MAP.get(base)
    if t is None:
        return T.StringType()  # unknown exotic types arrive as strings
    if unsigned and isinstance(t, (T.ByteType, T.ShortType, T.IntegerType)):
        # widen unsigned to the next signed size, Debezium-style
        return {
            T.ByteType: T.ShortType,
            T.ShortType: T.IntegerType,
            T.IntegerType: T.LongType,
        }[type(t)]()
    if unsigned and isinstance(t, T.LongType):
        return T.DecimalType(20, 0)
    return t


_CONSTRAINT_STARTERS = (
    "PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN", "CHECK",
    "FULLTEXT", "SPATIAL", "EXCLUDE",
)


def _bare_constraint_starter(ident_groups: tuple) -> bool:
    """True iff the leading identifier was an UNQUOTED word that is a
    constraint keyword. Quoted identifiers (`key`, "index", [check])
    are always column names — Debezium's MySQL history backticks every
    identifier, so ``\\`key\\` INT`` must parse as a column, not be
    dropped as a KEY constraint."""
    bare = ident_groups[3]
    return bare is not None and bare.upper() in _CONSTRAINT_STARTERS


def _split_top_level(body: str) -> list[str]:
    """Split a parenthesized column list on top-level commas."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "`'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_column_def(defn: str) -> T.StructField | None:
    """One ``name TYPE [modifiers]`` entry; None for table constraints."""
    m = re.match(rf"\s*{_IDENT}\s+(.*)", defn, re.DOTALL)
    if not m:
        return None
    name = _ident(m.groups()[:4])
    if _bare_constraint_starter(m.groups()[:4]):
        return None
    rest = m.group(5).strip()
    tm = re.match(
        r"([A-Za-z]+(?:\s+PRECISION)?(?:\s*\([^)]*\))?(?:\s+UNSIGNED)?)", rest,
        re.IGNORECASE,
    )
    if not tm:
        return None
    dtype = parse_sql_type(tm.group(1))
    nullable = not re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE)
    return T.StructField(name, dtype, nullable)


def _table_name(raw: str) -> str:
    """Normalize `db`.`table` / "db"."table" / db.table → unqualified
    lowercase table name (registry keys are per-table)."""
    last = raw.strip().split(".")[-1]
    return _strip_ident(last).lower()


# --- statement parsing ----------------------------------------------------

_RE_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<tbl>[^\s(]+)\s*\((?P<body>.*)\)[^)]*$",
    re.IGNORECASE | re.DOTALL,
)
_RE_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?:ONLY\s+)?(?P<tbl>[^\s]+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RE_DROP = re.compile(
    r"^\s*(?:DROP|TRUNCATE)\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<tbl>[^\s;]+)",
    re.IGNORECASE,
)
_RE_RENAME_TABLE = re.compile(
    r"^\s*RENAME\s+TABLE\s+(?P<a>[^\s]+)\s+TO\s+(?P<b>[^\s;]+)",
    re.IGNORECASE,
)


def apply_ddl(registry: SchemaRegistry, ddl: str) -> str | None:
    """Apply ONE DDL statement to the registry; returns the affected
    table name (or None for ignored statements). Each mutating statement
    registers a NEW schema version — the history stays replayable."""
    ddl = ddl.strip().rstrip(";")
    if not ddl:
        return None

    m = _RE_CREATE.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        fields = [
            f for f in (_parse_column_def(d) for d in _split_top_level(m.group("body")))
            if f is not None
        ]
        if not fields:
            raise ValueError(f"CREATE TABLE with no parseable columns: {ddl!r}")
        registry.register(tbl, T.StructType(fields))
        return tbl

    m = _RE_RENAME_TABLE.match(ddl)
    if m:
        a, b = _table_name(m.group("a")), _table_name(m.group("b"))
        registry.versions[b] = registry.versions.pop(a)
        return b

    m = _RE_DROP.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        if ddl.upper().lstrip().startswith("DROP"):
            registry.versions.pop(tbl, None)
        return tbl

    m = _RE_ALTER.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        rest = m.group("rest").strip().rstrip(";")
        rt = re.match(r"RENAME\s+TO\s+(?P<b>[^\s;]+)", rest, re.IGNORECASE)
        if rt:
            b = _table_name(rt.group("b"))
            registry.versions[b] = registry.versions.pop(tbl)
            return b
        fields = list(registry.latest(tbl).fields)
        changed = False
        for clause in _split_top_level(rest):
            fields, did = _apply_alter_clause(fields, clause)
            changed = changed or did
        if changed:
            registry.register(tbl, T.StructType(fields))
        return tbl

    return None  # GRANT/SET/USE/comments etc. — shape-irrelevant


def _apply_alter_clause(
    fields: list[T.StructField], clause: str
) -> tuple[list[T.StructField], bool]:
    c = clause.strip()

    m = re.match(rf"ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s+(.*)",
                 c, re.IGNORECASE | re.DOTALL)
    if m and not _bare_constraint_starter(m.groups()[:4]):
        # Re-quote the name: it was vetted above, and passing it bare
        # would re-trigger the keyword check for columns named `key` etc.
        f = _parse_column_def(f"`{_ident(m.groups()[:4])}` {m.group(5)}")
        if f is not None:
            return fields + [f], True
        return fields, False

    m = re.match(rf"DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?{_IDENT}", c,
                 re.IGNORECASE)
    if m and not _bare_constraint_starter(m.groups()[:4]):
        name = _ident(m.groups()[:4])
        return [f for f in fields if f.name != name], True

    m = re.match(rf"RENAME\s+COLUMN\s+{_IDENT}\s+TO\s+(.+)", c, re.IGNORECASE)
    if m:
        old, new = _ident(m.groups()[:4]), _strip_ident(m.group(5))
        return [
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in fields
        ], True

    m = re.match(rf"CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.*)", c,
                 re.IGNORECASE | re.DOTALL)
    if m:  # MySQL: CHANGE old new TYPE — rename + retype in one clause
        old, new = _ident(m.groups()[:4]), _ident(m.groups()[4:8])
        nf = _parse_column_def(f"`{new}` {m.group(9)}")
        return [nf if f.name == old and nf else f for f in fields], True

    m = re.match(rf"MODIFY\s+(?:COLUMN\s+)?{_IDENT}\s+(.*)", c,
                 re.IGNORECASE | re.DOTALL)
    if m:  # MySQL retype
        name = _ident(m.groups()[:4])
        nf = _parse_column_def(f"`{name}` {m.group(5)}")
        return [nf if f.name == name and nf else f for f in fields], True

    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?{_IDENT}\s+(?:SET\s+DATA\s+)?TYPE\s+(.*)", c,
        re.IGNORECASE | re.DOTALL,
    )
    if m:  # Postgres retype
        name = _ident(m.groups()[:4])
        dtype = parse_sql_type(m.group(5))
        return [
            T.StructField(name, dtype, f.nullable) if f.name == name else f
            for f in fields
        ], True

    return fields, False  # ADD CONSTRAINT / SET DEFAULT / engine options…


def replay_history(ddl_statements: list[str],
                   registry: SchemaRegistry | None = None) -> SchemaRegistry:
    """Replay an ordered schema-history DDL stream into a registry."""
    reg = registry if registry is not None else SchemaRegistry()
    for ddl in ddl_statements:
        apply_ddl(reg, ddl)
    return reg


def replay_history_df(history_df, registry: SchemaRegistry | None = None,
                      ddl_col: str = "ddl") -> SchemaRegistry:
    """Replay a schema-history DataFrame (one row per DDL event, in
    topic order — include an ordering column and sort before calling).
    The collect is control-plane: schema history is thousands of rows,
    never data-scale."""
    rows = history_df.select(ddl_col).collect()
    return replay_history([r[0] for r in rows if r[0]], registry)
