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
- ``ALTER TABLE t ALTER [COLUMN] c [SET DATA] TYPE TYPE``  (Postgres/Db2)
- ``ALTER TABLE t CHANGE [COLUMN] old new TYPE``    (MySQL rename+retype)
- ``DROP TABLE t`` / ``TRUNCATE TABLE t`` (history no-op for shape)
- ``RENAME TABLE a TO b`` / ``ALTER TABLE a RENAME TO b``

Dialects (``DialectContext(dialect=...)``) — the incubator's actual
sources were Oracle, Db2, and Cassandra
[/root/reference/README.md:21-23], so their DDL shapes replay too:

- ``oracle``: ``VARCHAR2/NVARCHAR2/CLOB/NCLOB/RAW/LONG RAW/
  BINARY_FLOAT/BINARY_DOUBLE/NUMBER[(p[,s])]/FLOAT``, ``DATE`` as
  datetime, ``TIMESTAMP [WITH [LOCAL] TIME ZONE]``, ``INTERVAL YEAR TO
  MONTH`` / ``DAY TO SECOND``, and parenthesized multi-column clauses
  ``ALTER TABLE t ADD (a T, b T) / MODIFY (…) / DROP (a, b)``.
- ``db2``: ``VARGRAPHIC/GRAPHIC/DBCLOB/DECFLOAT``, ``CHAR(n) FOR BIT
  DATA``, ``ALTER COLUMN c SET DATA TYPE t``.
- ``sqlserver`` (T-SQL, the Debezium connector dialect beyond the
  incubator trio): ``NVARCHAR(n|MAX)/NTEXT/UNIQUEIDENTIFIER/
  SQL_VARIANT/DATETIME2/SMALLDATETIME/DATETIMEOFFSET/MONEY/SMALLMONEY/
  VARBINARY(MAX)/IMAGE/ROWVERSION/HIERARCHYID``; ``TIMESTAMP`` is the
  rowversion binary (NOT a timestamp — dialect-gated), ``TINYINT`` is
  unsigned 0-255 → int16, ``FLOAT`` defaults to float(53) → double;
  bracketed identifiers with spaces (``[dbo].[Order Details]``),
  ``IDENTITY(s,i)`` modifiers, and the keyword-less retype
  ``ALTER TABLE t ALTER COLUMN c TYPE [NOT NULL]``.
- ``cassandra`` (CQL): scalar types (``text/varint/counter/timeuuid/
  inet/duration/…``), collections ``list<t>/set<t>/map<k,v>/
  tuple<…>/frozen<…>`` → Spark Array/Map/Struct, ``CREATE TYPE`` /
  ``ALTER TYPE … ADD|RENAME`` user-defined types → nested StructTypes
  (dependent tables re-version on ALTER TYPE), ``ALTER TABLE t ADD c t
  / DROP c / RENAME a TO b``, ``WITH clustering-order/properties``
  tails ignored.

Scale: DDL replay is control-plane — a schema-history topic holds
thousands of statements, not billions; parsing happens once on the
driver and the result is a per-version ``StructType`` that the
distributed normalizing reader (``SchemaRegistry.upgrade``) applies as
a plain projection, no shuffle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .schema_registry import SchemaRegistry


@dataclass
class DialectContext:
    """Per-history parse state: source dialect plus (for CQL) the
    user-defined-type registry and the raw column-type strings needed to
    re-resolve dependent tables when an ALTER TYPE lands."""

    dialect: str = "generic"  # generic | mysql | postgres | oracle | db2 | sqlserver | cassandra
    udts: dict[str, T.StructType] = field(default_factory=dict)
    # table -> column -> raw type string (recorded for cassandra only)
    column_types: dict[str, dict[str, str]] = field(default_factory=dict)


_GENERIC_CTX = DialectContext()


class UnparseableDDLError(ValueError):
    """A statement the DDL *parser* rejects (unbalanced parens, no
    parseable columns, an unknown type token). This — and ONLY this —
    is what ``schema.history.internal.skip.unparseable.ddl`` may skip.
    Semantic refusals (CQL counter tables, a RENAME whose source the
    registry never saw) are deliberate engine decisions and stay plain
    ``ValueError`` so they always surface."""

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
    # Oracle (string/binary spellings are dialect-safe globally)
    "VARCHAR2": T.StringType(),
    "NVARCHAR2": T.StringType(),
    "NCHAR": T.StringType(),
    "NVARCHAR": T.StringType(),
    "CLOB": T.StringType(),
    "NCLOB": T.StringType(),
    "ROWID": T.StringType(),
    "UROWID": T.StringType(),
    "XMLTYPE": T.StringType(),
    "RAW": T.BinaryType(),
    "BINARY_FLOAT": T.FloatType(),
    "BINARY_DOUBLE": T.DoubleType(),
    # SQL Server (unique T-SQL spellings are dialect-safe globally)
    "NTEXT": T.StringType(),
    "UNIQUEIDENTIFIER": T.StringType(),
    "SQL_VARIANT": T.StringType(),
    "DATETIME2": T.TimestampNTZType(),
    "SMALLDATETIME": T.TimestampNTZType(),
    "DATETIMEOFFSET": T.TimestampType(),  # carries offset -> instant
    "MONEY": T.DecimalType(19, 4),
    "SMALLMONEY": T.DecimalType(10, 4),
    "IMAGE": T.BinaryType(),
    "ROWVERSION": T.BinaryType(),
    "HIERARCHYID": T.BinaryType(),
    "GEOGRAPHY": T.BinaryType(),
    # Db2
    "GRAPHIC": T.StringType(),
    "VARGRAPHIC": T.StringType(),
    "DBCLOB": T.StringType(),
    "DECFLOAT": T.DoubleType(),  # decimal floating point → double
}


def parse_sql_type(type_str: str, dialect: str = "generic",
                   udts: dict[str, T.StructType] | None = None) -> T.DataType:
    """Map one SQL column type (``DECIMAL(12,2)``, ``varchar(255)``,
    ``double precision``, ``int unsigned``, ``NUMBER(10,2)``,
    ``frozen<map<text,int>>``…) to a Spark type."""
    if dialect == "cassandra":
        return _parse_cql_type(type_str, udts or {})
    s = type_str.strip().upper()
    s = re.sub(r"\s+", " ", s)
    if s.startswith("INTERVAL YEAR"):
        return T.YearMonthIntervalType()
    if s.startswith("INTERVAL DAY"):
        return T.DayTimeIntervalType()
    if "FOR BIT DATA" in s:  # Db2: CHAR/VARCHAR(n) FOR BIT DATA
        return T.BinaryType()
    if s.startswith("LONG RAW"):
        return T.BinaryType()
    if dialect == "oracle" and s == "LONG":
        return T.StringType()
    m = re.match(r"([A-Z_][A-Z0-9_]*)(?:\s+PRECISION)?(?:\s*\(([^)]*)\))?", s)
    if not m:
        raise UnparseableDDLError(f"unparseable SQL type: {type_str!r}")
    base, args = m.group(1), m.group(2)
    if dialect == "sqlserver":
        if base == "TIMESTAMP":
            return T.BinaryType()  # T-SQL TIMESTAMP IS rowversion
        if base == "TINYINT":
            return T.ShortType()   # T-SQL tinyint is unsigned 0-255
        if base == "FLOAT":
            return T.DoubleType()  # FLOAT defaults to float(53)
    unsigned = " UNSIGNED" in s
    if base == "TIMESTAMP" and "TIME ZONE" in s:
        # Oracle TIMESTAMP WITH [LOCAL] TIME ZONE → instant semantics
        return T.TimestampType()
    if base in ("DECIMAL", "NUMERIC", "DEC"):
        if args:
            parts = [int(p.strip()) for p in args.split(",")]
            prec, scale = parts[0], parts[1] if len(parts) > 1 else 0
        else:
            prec, scale = 10, 0
        return T.DecimalType(prec, scale)
    if base == "NUMBER":  # Oracle
        if args:
            parts = [p.strip() for p in args.split(",")]
            prec = 38 if parts[0] == "*" else int(parts[0])
            scale = int(parts[1]) if len(parts) > 1 else 0
            return T.DecimalType(prec, max(scale, 0))
        # unconstrained NUMBER — Debezium's VariableScaleDecimal analog
        return T.DecimalType(38, 10)
    if dialect == "oracle" and base == "FLOAT":
        return T.DoubleType()  # Oracle FLOAT(b) is a NUMBER subtype
    if dialect == "oracle" and base == "DATE":
        return T.TimestampNTZType()  # Oracle DATE carries time-of-day
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


# --- Cassandra CQL types --------------------------------------------------

_CQL_SCALARS: dict[str, T.DataType] = {
    "ASCII": T.StringType(),
    "TEXT": T.StringType(),
    "VARCHAR": T.StringType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "VARINT": T.DecimalType(38, 0),  # arbitrary-precision integer
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": T.DecimalType(38, 18),  # CQL decimal is variable-scale
    "BOOLEAN": T.BooleanType(),
    "BLOB": T.BinaryType(),
    "UUID": T.StringType(),
    "TIMEUUID": T.StringType(),
    "INET": T.StringType(),
    "DATE": T.DateType(),
    "TIME": T.LongType(),  # nanoseconds since midnight
    "TIMESTAMP": T.TimestampType(),  # epoch-millis, UTC instant
    "DURATION": T.StringType(),  # months/days/nanos triple, no SQL twin
}


def _split_angle_args(body: str) -> list[str]:
    """Split ``k, v`` / ``a, b, c`` at angle/paren depth 0."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_cql_type(s: str, udts: dict[str, T.StructType]) -> T.DataType:
    s = s.strip()
    m = re.match(r"^frozen\s*<(.*)>$", s, re.IGNORECASE | re.DOTALL)
    if m:  # frozen-ness is a storage detail, not a shape change
        return _parse_cql_type(m.group(1), udts)
    m = re.match(r"^(map|list|set|tuple)\s*<(.*)>$", s,
                 re.IGNORECASE | re.DOTALL)
    if m:
        kind, inner = m.group(1).lower(), m.group(2)
        args = _split_angle_args(inner)
        if kind == "map":
            if len(args) != 2:
                raise UnparseableDDLError(f"bad CQL map type: {s!r}")
            return T.MapType(
                _parse_cql_type(args[0], udts), _parse_cql_type(args[1], udts)
            )
        if kind in ("list", "set"):  # sets surface as arrays in Spark
            return T.ArrayType(_parse_cql_type(args[0], udts))
        return T.StructType(
            [
                T.StructField(f"_{i + 1}", _parse_cql_type(a, udts), True)
                for i, a in enumerate(args)
            ]
        )
    bare = _strip_ident(s).strip()
    if bare.upper() == "COUNTER":
        # Refused, not mapped: the Cassandra commitlog carries counter
        # DELTAS, not values — a cell fold treating them as absolute
        # writes corrupts state, which is why public Debezium's
        # Cassandra connector does not support counter tables at all.
        raise ValueError(
            "CQL counter columns are not CDC-able (commitlog records "
            "deltas, not values); exclude the table from capture"
        )
    t = _CQL_SCALARS.get(bare.upper())
    if t is not None:
        return t
    udt = udts.get(bare.lower())
    if udt is not None:
        return udt
    return T.StringType()  # unknown/custom types arrive as strings


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


def _split_top_level(body: str, angles: bool = False) -> list[str]:
    """Split a parenthesized column list on top-level commas. With
    ``angles`` (CQL), ``<…>`` nesting also guards commas — never enable
    it for relational dialects, where a bare ``>`` in a CHECK clause
    would unbalance the scan."""
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
        elif ch == "(" or (angles and ch == "<"):
            depth += 1
            cur.append(ch)
        elif ch == ")" or (angles and ch == ">"):
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


def _paren_body(stmt: str, start: int) -> str:
    """Return the contents of the balanced ``(...)`` opening at
    ``stmt[start]`` (quote-aware) — survives trailing dialect tails with
    their own parens (``ENGINE=…``, CQL ``WITH CLUSTERING ORDER BY (…)``)."""
    depth, quote = 0, None
    for i in range(start, len(stmt)):
        ch = stmt[i]
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "`'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return stmt[start + 1:i]
    raise UnparseableDDLError(f"unbalanced parentheses in DDL: {stmt[:80]!r}")


# CQL column defs may end in STATIC / PRIMARY KEY modifiers
_CQL_COL_TAIL = re.compile(
    r"(?:\s+STATIC|\s+PRIMARY\s+KEY)+\s*$", re.IGNORECASE
)

_TYPE_TOKEN = re.compile(
    r"("
    r"INTERVAL\s+YEAR(?:\s*\(\d+\))?\s+TO\s+MONTH"
    r"|INTERVAL\s+DAY(?:\s*\(\d+\))?\s+TO\s+SECOND(?:\s*\(\d+\))?"
    r"|LONG\s+RAW"
    r"|[A-Za-z_][A-Za-z0-9_]*"
    r"(?:\s+PRECISION)?(?:\s*\([^)]*\))?(?:\s+UNSIGNED)?"
    r"(?:\s+WITH(?:\s+LOCAL)?\s+TIME\s+ZONE)?"
    r"(?:\s+FOR\s+BIT\s+DATA)?"
    r")",
    re.IGNORECASE,
)


def _parse_column_def_ex(
    defn: str, ctx: DialectContext
) -> tuple[T.StructField | None, str | None]:
    """One ``name TYPE [modifiers]`` entry → (field, raw type string);
    (None, None) for table constraints."""
    m = re.match(rf"\s*{_IDENT}\s+(.*)", defn, re.DOTALL)
    if not m:
        return None, None
    name = _ident(m.groups()[:4])
    if _bare_constraint_starter(m.groups()[:4]):
        return None, None
    rest = m.group(5).strip()
    if ctx.dialect == "cassandra":
        tstr = _CQL_COL_TAIL.sub("", rest).strip()
        return (
            T.StructField(name, _parse_cql_type(tstr, ctx.udts), True),
            tstr,
        )
    tm = _TYPE_TOKEN.match(rest)
    if not tm:
        return None, None
    tstr = tm.group(1)
    dtype = parse_sql_type(tstr, ctx.dialect, ctx.udts)
    nullable = not re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE)
    return T.StructField(name, dtype, nullable), tstr


def _parse_column_def(defn: str, ctx: DialectContext = _GENERIC_CTX
                      ) -> T.StructField | None:
    return _parse_column_def_ex(defn, ctx)[0]


def _table_name(raw: str) -> str:
    """Normalize `db`.`table` / "db"."table" / db.table → unqualified
    lowercase table name (registry keys are per-table)."""
    last = raw.strip().split(".")[-1]
    return _strip_ident(last).lower()


# --- statement parsing ----------------------------------------------------

_RE_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<tbl>(?:`[^`]*`|\[[^\]]*\]|\"[^\"]*\"|[^\s(;])+)\s*(?=\()",
    re.IGNORECASE | re.DOTALL,
)
_RE_CREATE_TYPE = re.compile(
    r"^\s*CREATE\s+TYPE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<n>[^\s(]+)\s*(?=\()",
    re.IGNORECASE | re.DOTALL,
)
_RE_ALTER_TYPE = re.compile(
    r"^\s*ALTER\s+TYPE\s+(?P<n>[^\s]+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RE_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?:ONLY\s+)?(?P<tbl>(?:`[^`]*`|\[[^\]]*\]|\"[^\"]*\"|[^\s(;])+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RE_DROP = re.compile(
    r"^\s*(?:DROP|TRUNCATE)\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<tbl>(?:`[^`]*`|\[[^\]]*\]|\"[^\"]*\"|[^\s(;])+)",
    re.IGNORECASE,
)
_RE_RENAME_TABLE = re.compile(
    r"^\s*RENAME\s+TABLE\s+(?P<a>[^\s]+)\s+TO\s+(?P<b>[^\s;]+)",
    re.IGNORECASE,
)


def _rename_table(registry: SchemaRegistry, ctx: DialectContext,
                  a: str, b: str) -> None:
    """Shared rename semantics for ``RENAME TABLE a TO b`` and
    ``ALTER TABLE a RENAME TO b``. A rename whose source the registry
    never saw is a SEMANTIC error (typically the source was excluded by
    ``captured_tables`` while the destination is captured) — raised as a
    plain ValueError, never skippable by ``skip_unparseable``."""
    if a not in registry.versions:
        raise ValueError(
            f"RENAME of unknown table {a!r} to {b!r}: the source was "
            f"never registered (was its CREATE filtered out by "
            f"captured_tables while {b!r} is captured?) — refusing to "
            f"silently drop the rename"
        )
    registry.versions[b] = registry.versions.pop(a)
    if a in ctx.column_types:
        ctx.column_types[b] = ctx.column_types.pop(a)


def apply_ddl(registry: SchemaRegistry, ddl: str,
              ctx: DialectContext | None = None) -> str | None:
    """Apply ONE DDL statement to the registry; returns the affected
    table name (or None for ignored statements). Each mutating statement
    registers a NEW schema version — the history stays replayable."""
    ctx = ctx if ctx is not None else DialectContext()
    ddl = ddl.strip().rstrip(";")
    if not ddl:
        return None
    cql = ctx.dialect == "cassandra"

    m = _RE_CREATE.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        body = _paren_body(ddl, m.end())
        fields, tstrs = [], {}
        for d in _split_top_level(body, angles=cql):
            f, tstr = _parse_column_def_ex(d, ctx)
            if f is not None:
                fields.append(f)
                tstrs[f.name] = tstr
        if not fields:
            raise UnparseableDDLError(f"CREATE TABLE with no parseable columns: {ddl!r}")
        registry.register(tbl, T.StructType(fields))
        if cql:
            ctx.column_types[tbl] = tstrs
        return tbl

    m = _RE_CREATE_TYPE.match(ddl)
    if m and cql:
        name = _table_name(m.group("n"))
        body = _paren_body(ddl, m.end())
        fields = [
            f for f in (
                _parse_column_def(d, ctx)
                for d in _split_top_level(body, angles=True)
            )
            if f is not None
        ]
        ctx.udts[name] = T.StructType(fields)
        return None  # type definitions don't name a table

    m = _RE_ALTER_TYPE.match(ddl)
    if m and cql:
        _alter_cql_type(
            registry, ctx, _table_name(m.group("n")), m.group("rest")
        )
        return None

    m = _RE_RENAME_TABLE.match(ddl)
    if m:
        a, b = _table_name(m.group("a")), _table_name(m.group("b"))
        _rename_table(registry, ctx, a, b)
        return b

    m = _RE_DROP.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        if ddl.upper().lstrip().startswith("DROP"):
            registry.versions.pop(tbl, None)
            ctx.column_types.pop(tbl, None)
        return tbl

    m = _RE_ALTER.match(ddl)
    if m:
        tbl = _table_name(m.group("tbl"))
        rest = m.group("rest").strip().rstrip(";")
        rt = re.match(r"RENAME\s+TO\s+(?P<b>[^\s;]+)", rest, re.IGNORECASE)
        if rt:
            b = _table_name(rt.group("b"))
            _rename_table(registry, ctx, tbl, b)
            return b
        if tbl not in registry.versions:
            # can't be interpreted against the known model (its CREATE
            # was itself skipped/filtered) — a PARSE-tier failure, so
            # skip_unparseable may skip it. Renames are different: a
            # missing rename SOURCE loses a captured table and raises a
            # plain ValueError above.
            raise UnparseableDDLError(
                f"ALTER TABLE against unknown table {tbl!r}: this "
                f"history never created it"
            )
        fields = list(registry.latest(tbl).fields)
        record = ctx.column_types.setdefault(tbl, {}) if cql else {}
        changed = False
        for clause in _split_top_level(rest, angles=cql):
            fields, did = _apply_alter_clause(fields, clause, ctx, record)
            changed = changed or did
        if changed:
            registry.register(tbl, T.StructType(fields))
        return tbl

    return None  # GRANT/SET/USE/comments etc. — shape-irrelevant


def _apply_alter_clause(
    fields: list[T.StructField], clause: str,
    ctx: DialectContext = _GENERIC_CTX,
    record: dict[str, str] | None = None,
) -> tuple[list[T.StructField], bool]:
    c = clause.strip()
    record = record if record is not None else {}

    # Oracle/CQL parenthesized multi-column form:
    # ADD (a T, b T) / MODIFY (a T) / DROP (a, b)
    m = re.match(r"(ADD|MODIFY|DROP)\s*(?=\()", c, re.IGNORECASE)
    if m:
        verb = m.group(1).upper()
        items = _split_top_level(
            _paren_body(c, m.end()), angles=ctx.dialect == "cassandra"
        )
        changed = False
        for item in items:
            sub = f"DROP COLUMN {item}" if verb == "DROP" else f"{verb} {item}"
            fields, did = _apply_alter_clause(fields, sub, ctx, record)
            changed = changed or did
        return fields, changed

    m = re.match(rf"ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s+(.*)",
                 c, re.IGNORECASE | re.DOTALL)
    if m and not _bare_constraint_starter(m.groups()[:4]):
        # Re-quote the name: it was vetted above, and passing it bare
        # would re-trigger the keyword check for columns named `key` etc.
        f, tstr = _parse_column_def_ex(
            f"`{_ident(m.groups()[:4])}` {m.group(5)}", ctx
        )
        if f is not None:
            record[f.name] = tstr
            return fields + [f], True
        return fields, False

    m = re.match(rf"DROP\s+(?:COLUMN\s+)?(?:IF\s+EXISTS\s+)?{_IDENT}", c,
                 re.IGNORECASE)
    if m and not _bare_constraint_starter(m.groups()[:4]):
        name = _ident(m.groups()[:4])
        record.pop(name, None)
        return [f for f in fields if f.name != name], True

    m = re.match(rf"RENAME\s+(?:COLUMN\s+)?{_IDENT}\s+TO\s+(.+)", c,
                 re.IGNORECASE)
    if m:  # standard RENAME COLUMN; CQL allows bare RENAME a TO b
        old, new = _ident(m.groups()[:4]), _strip_ident(m.group(5))
        if old in record:
            record[new] = record.pop(old)
        return [
            T.StructField(new, f.dataType, f.nullable) if f.name == old else f
            for f in fields
        ], True

    m = re.match(rf"CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.*)", c,
                 re.IGNORECASE | re.DOTALL)
    if m:  # MySQL: CHANGE old new TYPE — rename + retype in one clause
        old, new = _ident(m.groups()[:4]), _ident(m.groups()[4:8])
        nf = _parse_column_def(f"`{new}` {m.group(9)}", ctx)
        return [nf if f.name == old and nf else f for f in fields], True

    m = re.match(rf"MODIFY\s+(?:COLUMN\s+)?{_IDENT}\s+(.*)", c,
                 re.IGNORECASE | re.DOTALL)
    if m:  # MySQL/Oracle retype
        name = _ident(m.groups()[:4])
        nf, tstr = _parse_column_def_ex(f"`{name}` {m.group(5)}", ctx)
        if nf is not None:
            record[name] = tstr
        return [nf if f.name == name and nf else f for f in fields], True

    if ctx.dialect == "sqlserver":
        m = re.match(rf"ALTER\s+COLUMN\s+{_IDENT}\s+(.*)", c,
                     re.IGNORECASE | re.DOTALL)
        if m:  # T-SQL retype: ALTER COLUMN c NVARCHAR(100) [NOT NULL]
            name = _ident(m.groups()[:4])
            nf, tstr = _parse_column_def_ex(f"[{name}] {m.group(5)}", ctx)
            if nf is not None:
                record[name] = tstr
            return [nf if f.name == name and nf else f for f in fields], True

    m = re.match(
        rf"ALTER\s+(?:COLUMN\s+)?{_IDENT}\s+(?:SET\s+DATA\s+)?TYPE\s+(.*)", c,
        re.IGNORECASE | re.DOTALL,
    )
    if m:  # Postgres/Db2 retype; CQL (pre-3.10) ALTER c TYPE t
        name = _ident(m.groups()[:4])
        record[name] = m.group(5)
        dtype = parse_sql_type(m.group(5), ctx.dialect, ctx.udts)
        return [
            T.StructField(name, dtype, f.nullable) if f.name == name else f
            for f in fields
        ], True

    return fields, False  # ADD CONSTRAINT / SET DEFAULT / engine options…


def _alter_cql_type(registry: SchemaRegistry, ctx: DialectContext,
                    name: str, rest: str) -> None:
    """``ALTER TYPE t ADD f T`` / ``ALTER TYPE t RENAME a TO b [AND …]``.
    Dependent tables re-resolve their recorded column type strings
    against the updated UDT and register a NEW schema version — exactly
    how a history consumer must see nested-type evolution."""
    st = ctx.udts.get(name)
    if st is None:
        raise ValueError(f"ALTER TYPE for unknown type {name!r}")
    fields = list(st.fields)
    r = rest.strip().rstrip(";")
    m = re.match(rf"ADD\s+{_IDENT}\s+(.*)", r, re.IGNORECASE | re.DOTALL)
    if m:
        fname = _ident(m.groups()[:4])
        fields.append(
            T.StructField(fname, _parse_cql_type(m.group(5), ctx.udts), True)
        )
    elif re.match(r"RENAME\s+", r, re.IGNORECASE):
        pairs = re.findall(
            rf"{_IDENT}\s+TO\s+{_IDENT}", r[len("RENAME"):], re.IGNORECASE
        )
        # findall yields '' (not None) for unmatched alternation groups
        renames = {
            next(g for g in p[:4] if g): next(g for g in p[4:8] if g)
            for p in pairs
        }
        fields = [
            T.StructField(renames.get(f.name, f.name), f.dataType, f.nullable)
            for f in fields
        ]
    else:
        return  # ALTER TYPE … WITH …: no shape change
    ctx.udts[name] = T.StructType(fields)
    # re-version every table whose recorded column types mention the UDT
    pat = re.compile(rf"\b{re.escape(name)}\b", re.IGNORECASE)
    for tbl, colmap in ctx.column_types.items():
        using = {c for c, tstr in colmap.items() if tstr and pat.search(tstr)}
        if using and tbl in registry.versions:
            newf = [
                T.StructField(
                    f.name, _parse_cql_type(colmap[f.name], ctx.udts),
                    f.nullable,
                )
                if f.name in using
                else f
                for f in registry.latest(tbl).fields
            ]
            registry.register(tbl, T.StructType(newf))


def replay_history(ddl_statements: list[str],
                   registry: SchemaRegistry | None = None,
                   dialect: str = "generic",
                   captured_tables: list[str] | None = None,
                   skip_unparseable: bool = False) -> SchemaRegistry:
    """Replay an ordered schema-history DDL stream into a registry.

    ``captured_tables`` — ``schema.history.internal.store.only.captured.
    tables.ddl``: when set, only statements TARGETING a listed table
    mutate the registry. The filter is by statement-level name match
    (the same string-level filtering public Debezium applies when
    writing the history) — an ALTER against an uncaptured table is
    dropped without touching the registry, so it can't fail on the
    table never having been created. CREATE/ALTER TYPE and other
    non-table statements always apply (UDTs are shared). A RENAME
    applies when EITHER side is captured. ``skip_unparseable`` —
    ``schema.history.internal.skip.unparseable.ddl``: a statement the
    parser rejects is skipped instead of stopping the replay (the
    Debezium default is to stop — skipping risks a silently stale
    schema, so it stays opt-in here too)."""
    reg = registry if registry is not None else SchemaRegistry()
    ctx = DialectContext(dialect=dialect)
    captured = (
        None if captured_tables is None
        else {t.lower() for t in captured_tables}
    )
    for ddl in ddl_statements:
        if captured is not None:
            targets = ddl_target_tables(ddl)
            if targets and not (targets & captured):
                continue
        try:
            apply_ddl(reg, ddl, ctx)
        except UnparseableDDLError:
            # only true parse rejections are skippable; semantic
            # refusals (counter tables, missing rename source, ALTER of
            # an unknown table) propagate even with the flag set.
            if not skip_unparseable:
                raise
    return reg


def ddl_target_tables(ddl: str) -> set[str]:
    """Table name(s) a DDL statement targets (normalized, unqualified),
    by the same statement regexes :func:`apply_ddl` dispatches on.
    Empty set = not a table statement (CREATE/ALTER TYPE, GRANT, …)."""
    s = ddl.strip().rstrip(";")
    # renames FIRST (both spellings) — they target TWO tables, and the
    # ALTER TABLE … RENAME TO form would otherwise be swallowed by the
    # generic _RE_ALTER single-table answer, silently dropping a rename
    # INTO a captured table under captured_tables filtering.
    if m := _RE_RENAME_TABLE.match(s):
        return {_table_name(m.group("a")), _table_name(m.group("b"))}
    if m := _RE_ALTER.match(s):
        rt = re.match(r"RENAME\s+TO\s+(?P<b>[^\s;]+)",
                      m.group("rest").strip(), re.IGNORECASE)
        if rt:
            return {_table_name(m.group("tbl")),
                    _table_name(rt.group("b"))}
        return {_table_name(m.group("tbl"))}
    for rx in (_RE_CREATE, _RE_DROP):
        if m := rx.match(s):
            return {_table_name(m.group("tbl"))}
    return set()


def replay_history_df(history_df, registry: SchemaRegistry | None = None,
                      ddl_col: str = "ddl",
                      dialect: str = "generic") -> SchemaRegistry:
    """Replay a schema-history DataFrame (one row per DDL event, in
    topic order — include an ordering column and sort before calling).
    The collect is control-plane: schema history is thousands of rows,
    never data-scale."""
    rows = history_df.select(ddl_col).collect()
    return replay_history([r[0] for r in rows if r[0]], registry, dialect)


#: typed shape of one schema-change-topic event (public Debezium's
#: ``include.schema.changes=true`` stream: one event per DDL, payload
#: carrying the statement plus the structured post-DDL table shape)
SCHEMA_CHANGE_EVENT = T.StructType([
    T.StructField("pos", T.LongType()),
    T.StructField("database", T.StringType()),
    T.StructField("ddl", T.StringType()),
    T.StructField("change_type", T.StringType()),   # CREATE/ALTER/DROP
    T.StructField("table_id", T.StringType()),
    T.StructField("columns", T.ArrayType(T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("type_name", T.StringType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("optional", T.BooleanType()),
    ]))),
])


def schema_change_events(
    spark,
    ddl_statements: list[str],
    database: str = "db",
    dialect: str = "generic",
    registry: SchemaRegistry | None = None,
) -> "DataFrame":
    """The schema-change topic (``include.schema.changes=true``): one
    typed event per shape-mutating DDL, carrying the raw statement AND
    the structured post-statement table shape (Debezium's
    ``tableChanges`` payload) so consumers never re-parse dialect DDL.

    Classification mirrors the public contract: CREATE (table newly
    registered), ALTER (a new schema version appended — renames
    included, under the new id), DROP (table gone; ``columns`` NULL).
    Statements that don't change any table shape (GRANT/USE/comments)
    emit nothing, exactly like Debezium's filtered history.

    Control-plane by design: the DDL replay is a driver loop over the
    (tiny) history; the returned DataFrame is the sink-able wire form.
    """
    reg = registry if registry is not None else SchemaRegistry()
    ctx = DialectContext(dialect=dialect)
    rows: list[tuple] = []
    for pos, ddl in enumerate(ddl_statements):
        before = {t: len(v) for t, v in reg.versions.items()}
        tbl = apply_ddl(reg, ddl, ctx)
        if tbl is None:
            continue
        after = {t: len(v) for t, v in reg.versions.items()}
        if tbl not in after:
            kind, cols = "DROP", None
        else:
            renamed_from = [t for t in before if t not in after]
            if tbl not in before and not renamed_from:
                kind = "CREATE"
            else:
                kind = "ALTER"
            if after.get(tbl) == before.get(tbl) and not renamed_from:
                continue  # no new version registered — shape unchanged
            cols = [
                (f.name, f.dataType.simpleString(), i + 1, f.nullable)
                for i, f in enumerate(reg.latest(tbl).fields)
            ]
        rows.append(
            (pos, database, ddl.strip().rstrip(";"), kind,
             f"{database}.{tbl}", cols)
        )
    return spark.createDataFrame(rows, SCHEMA_CHANGE_EVENT)


def schema_change_wire(events: "DataFrame", topic_prefix: str) -> "DataFrame":
    """Render schema-change events to the wire: key = ``{databaseName}``
    JSON, value = the full event JSON, topic = the connector's
    ``topic.prefix`` (public Debezium publishes schema changes to the
    topic named by the prefix itself). Expression-level ``to_json`` —
    the same sink contract as the data-plane envelope."""
    from pyspark.sql import functions as F

    return events.select(
        F.to_json(F.struct(F.col("database").alias("databaseName"))).alias(
            "key"
        ),
        F.to_json(F.struct(
            F.col("pos"),
            F.col("database").alias("databaseName"),
            F.col("ddl"),
            F.struct(
                F.col("change_type").alias("type"),
                F.col("table_id").alias("id"),
                F.struct(F.col("columns")).alias("table"),
            ).alias("tableChanges"),
        )).alias("value"),
        F.lit(topic_prefix).alias("topic"),
    )
