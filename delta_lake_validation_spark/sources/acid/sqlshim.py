"""SQL-string entry point for ACID DML — EP1 write parity.

The reference drives every write through ``spark.sql`` strings: INSERT
(src/validation_suite.py:375-404), MERGE (:489-524), DELETE (:738-740),
UPDATE (:762-764), and reads CDF via the ``table_changes`` TVF (:480-486).
Without delta-spark there is no SQL parser hook for these statements, so
this shim recognizes exactly those statement shapes and dispatches to the
``AcidTable`` API; everything else (SELECT, WITH, EXPLAIN…) runs through
``spark.sql`` verbatim with the registered ACID tables exposed as temp
views of their current snapshots.

Deliberate scope: the four reference DML shapes with their documented
variations (optional PARTITION clause and column list on INSERT; aliased or
table-name-qualified MERGE with "update all columns / insert all columns"
branches).  Anything outside raises ``AcidSqlError`` rather than guessing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_validation_spark.sources.acid.errors import AcidTableError
from delta_lake_validation_spark.sources.acid.table import AcidTable


class AcidSqlError(AcidTableError):
    pass


_WS = r"[\s\n]+"


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and quotes.  Inside a string
    literal both backslash escapes (\\') and doubled quotes ('') are
    honored — Spark SQL accepts both, and treating an escaped quote as the
    closing quote would flip the in-string state and corrupt the split."""
    parts, depth, buf, quote = [], 0, [], None
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if quote:
            buf.append(ch)
            if ch == "\\" and i + 1 < n:
                buf.append(text[i + 1])
                i += 2
                continue
            if ch == quote:
                if i + 1 < n and text[i + 1] == quote:  # doubled-quote escape
                    buf.append(text[i + 1])
                    i += 2
                    continue
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


def _quote_spans(text: str) -> list[tuple[int, int]]:
    """[start, end) spans of string literals (same escape rules as above)."""
    spans, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            start, quote = i, ch
            i += 1
            while i < n:
                if text[i] == "\\":
                    i += 2
                    continue
                if text[i] == quote:
                    if i + 1 < n and text[i + 1] == quote:
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            spans.append((start, i))
        else:
            i += 1
    return spans


def _split_at_top_keyword(text: str, keyword: str) -> tuple[str, str | None]:
    """Split at the first standalone ``keyword`` that sits outside quotes
    and outside parentheses (a WHERE inside a string literal or a subquery
    must not terminate the SET clause)."""
    spans = _quote_spans(text)
    for m in re.finditer(rf"\b{keyword}\b", text, re.IGNORECASE):
        if any(a <= m.start() < b for a, b in spans):
            continue
        if text[: m.start()].count("(") != text[: m.start()].count(")"):
            continue
        return text[: m.start()].strip(), text[m.end():].strip()
    return text.strip(), None


def _sub_outside_quotes(pattern: re.Pattern, repl, text: str) -> str:
    """re.sub that never rewrites inside string literals."""
    while True:
        spans = _quote_spans(text)
        for m in pattern.finditer(text):
            if any(a <= m.start() < b for a, b in spans):
                continue
            text = text[: m.start()] + repl(m) + text[m.end():]
            break
        else:
            return text


class _DeltaSqlTable:
    """Adapter exposing a REAL Delta table (`_delta_log`) through the
    method surface :class:`AcidSqlContext` drives, so the reference's SQL
    statements run verbatim against genuine Delta tables too (INSERT,
    DELETE, UPDATE, MERGE, OPTIMIZE [WHERE] [ZORDER BY], VACUUM, RESTORE,
    DESCRIBE, time travel, table_changes).  Every operation opens a fresh
    :class:`DeltaTable` handle — commits landed by other writers between
    statements are always visible.  Operations the Delta writer doesn't
    implement (CHECK constraints, schema-altering DDL) raise rather than
    guess."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location

    def _t(self):
        from delta_lake_validation_spark.sources.delta_log import DeltaTable

        return DeltaTable(self.spark, self.location)

    def schema(self):
        return self._t().snapshot().schema

    def alter_properties(self, set_props=None, unset=()):
        return self._t().alter_properties(set_props, unset)

    def add_columns(self, columns):
        return self._t().add_columns(columns)

    def rename_column(self, old, new):
        return self._t().rename_column(old, new)

    def drop_column(self, name):
        return self._t().drop_column(name)

    def read(self, version=None, timestamp=None):
        return self._t().read(version=version, timestamp=timestamp)

    def read_changes(self, start_version, end_version=None):
        return self._t().read_changes(start_version, end_version)

    def history(self):
        return self._t().history()

    def detail(self):
        return self._t().detail()

    def append(self, df: DataFrame) -> int:
        return self._t().append(df)

    def overwrite_where(self, df: DataFrame, predicate: str) -> int:
        return self._t().overwrite(df, replace_where=predicate)

    def delete(self, predicate: str | None) -> int:
        return self._t().delete(predicate if predicate else "true")

    def update(self, assignments: dict[str, str], condition: str) -> int:
        return self._t().update(assignments, condition)

    def merge(self, source: DataFrame, keys: list[str]) -> int:
        return self._t().merge_upsert(source, keys)

    def merge_clauses(self, source: DataFrame, keys: list[str], **kw) -> int:
        return self._t().merge(source, keys, **kw)

    def optimize(self, zorder_by=None, where=None, target_files: int = 1) -> int:
        return self._t().optimize(
            target_files=target_files, zorder_by=zorder_by, where=where
        )

    def vacuum(self, retain_hours: float = 168.0, dry_run: bool = False):
        return self._t().vacuum(retain_hours=retain_hours, dry_run=dry_run)

    def restore(self, version: int) -> int:
        return self._t().restore(version)

    def cleanup_log(self, retain_hours=None, dry_run: bool = False):
        return self._t().cleanup_log(
            retain_hours=retain_hours, dry_run=dry_run
        )

    @property
    def log(self):
        """Minimal log facade: RESTORE … TIMESTAMP AS OF resolves its
        version through ``log.version_for_timestamp`` on the ACID path."""
        table = self._t()

        class _Log:
            version_for_timestamp = staticmethod(table.version_for_timestamp)

        return _Log()

    def __getattr__(self, name):
        if name.startswith("_"):  # dunder/protocol probes stay AttributeError
            raise AttributeError(name)
        raise AcidSqlError(
            f"operation {name!r} is not implemented for Delta interop tables"
        )


class AcidSqlContext:
    """Name → AcidTable registry plus the ``sql()`` dispatcher."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, AcidTable] = {}

    def register(self, name: str, table: AcidTable) -> None:
        self._tables[name] = table

    def register_delta(self, name: str, location: str) -> None:
        """Expose a REAL Delta table (`_delta_log` at ``location``) under
        ``name`` — the reference's SQL DML/lifecycle statements then run
        against it verbatim (INSERT/DELETE/UPDATE/MERGE/OPTIMIZE/VACUUM/
        DESCRIBE/table_changes/time travel)."""
        self._tables[name] = _DeltaSqlTable(self.spark, location)

    def table(self, name: str) -> AcidTable:
        if name not in self._tables:
            raise AcidSqlError(f"unknown ACID table {name!r}; registered: {sorted(self._tables)}")
        return self._tables[name]

    # ------------------------------------------------------------------ sql
    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement.  DML returns None; queries return a DataFrame."""
        s = statement.strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        if head == "INSERT":
            return self._insert(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "MERGE":
            return self._merge(s)
        if head == "DESCRIBE":
            return self._describe(s)
        if head == "RESTORE":
            return self._restore(s)
        if head == "ALTER":
            return self._alter(s)
        if head == "VACUUM":
            return self._vacuum(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "CREATE":
            if re.search(rf"SHALLOW{_WS}CLONE", s, re.IGNORECASE):
                return self._shallow_clone(s)
            return self._create(s)
        if head == "DROP":
            return self._drop(s)
        if head == "SHOW":
            return self._show(s)
        if head == "CONVERT":
            return self._convert(s)
        return self._query(s)

    def _insert_overwrite(self, m: re.Match) -> None:
        """``INSERT OVERWRITE [TABLE] t [PARTITION (c=lit, …)] SELECT|VALUES``
        — Spark's standard overwrite statement.  Without a PARTITION clause
        the whole table is replaced; with one, the overwrite scopes to that
        static partition via ``overwrite_where`` (both registrations have
        it), and the partition literals stamp onto the frame exactly as a
        static-partition INSERT would."""
        t = self.table(m.group("table"))
        schema = t.schema()
        body = m.group("body")
        part_assigns: list[tuple[str, str]] = []
        if m.group("part"):
            for assign in _split_top_level(m.group("part")):
                col, _, lit = assign.partition("=")
                part_assigns.append((col.strip(), lit.strip()))
        by_lower = {c.lower(): c for c in schema.fieldNames()}
        part_assigns = [
            (by_lower.get(c.lower(), c), lit) for c, lit in part_assigns
        ]
        part_names = {c for c, _ in part_assigns}
        # the body supplies the non-partition columns (or all columns when
        # there is no PARTITION clause), POSITIONALLY — standard SQL INSERT
        # column resolution
        body_cols = [c for c in schema.fieldNames() if c not in part_names]
        if body.upper().startswith("VALUES"):
            df = self.spark.sql(
                f"SELECT * FROM ({body}) AS __v({', '.join(body_cols)})"
            )
        else:
            df = self.spark.sql(body)
            if len(df.columns) != len(body_cols):
                raise AcidSqlError(
                    f"INSERT OVERWRITE body yields {len(df.columns)} columns; "
                    f"the table needs {len(body_cols)} ({body_cols})"
                )
            df = df.toDF(*body_cols)
        for col, lit in part_assigns:
            df = df.withColumn(col, F.expr(lit))
        for f in schema.fields:  # align types/order with the table
            df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
        df = df.select(*schema.fieldNames())
        if not part_assigns:
            t.overwrite(df)
            return None
        pred = " AND ".join(f"{c} = {lit}" for c, lit in part_assigns)
        fn = getattr(t, "overwrite_where", None)
        if fn is None:
            raise AcidSqlError(
                "partition-scoped INSERT OVERWRITE is not implemented for "
                "this registration"
            )
        fn(df, pred)
        return None

    def _convert(self, s: str) -> None:
        """``CONVERT TO DELTA parquet.`/path` [PARTITIONED BY (ddl)]`` —
        in-place zero-copy adoption of a parquet directory (delta-spark's
        CONVERT statement), over ``convert_to_delta``."""
        m = re.match(
            rf"CONVERT{_WS}TO{_WS}DELTA{_WS}parquet\s*\.\s*`(?P<loc>[^`]+)`"
            rf"(?:{_WS}PARTITIONED{_WS}BY{_WS}\((?P<part>[^)]*)\))?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported CONVERT shape: {s[:120]}...")
        from delta_lake_validation_spark.sources.delta_log import (
            convert_to_delta,
        )

        convert_to_delta(
            self.spark, m.group("loc"), partition_schema=m.group("part")
        )
        return None

    # ----------------------------------------------------------- lifecycle
    def _vacuum(self, s: str) -> DataFrame:
        """VACUUM t [RETAIN n HOURS] [DRY RUN] (ref: validation_suite.py:461;
        the reference first disables the retention-duration check via SET,
        which runs through _query as a plain Spark conf statement)."""
        m = re.match(
            rf"VACUUM{_WS}(?P<table>\w+)"
            rf"(?:{_WS}RETAIN{_WS}(?P<hours>\d+(?:\.\d+)?){_WS}HOURS?)?"
            rf"(?:{_WS}(?P<dry>DRY{_WS}RUN))?$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported VACUUM shape: {s[:120]}...")
        t = self.table(m.group("table"))
        hours = float(m.group("hours")) if m.group("hours") is not None else 168.0
        deleted = t.vacuum(retain_hours=hours, dry_run=m.group("dry") is not None)
        # Delta's VACUUM returns one path row per reclaimed (or reclaimable,
        # under DRY RUN) file
        return self.spark.createDataFrame(
            [(p,) for p in deleted], "path string"
        )

    def _optimize(self, s: str) -> DataFrame:
        """OPTIMIZE t [WHERE part-pred] [ZORDER BY (c1, c2)]
        (ref: validation_suite.py:466-477, all three documented forms)."""
        m = re.match(
            rf"OPTIMIZE{_WS}(?P<table>\w+)"
            rf"(?:{_WS}WHERE{_WS}(?P<pred>.+?))?"
            rf"(?:{_WS}ZORDER{_WS}BY{_WS}(?P<zcols>\([^)]*\)|[\w,\s]+))?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(f"unsupported OPTIMIZE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        zorder = None
        if m.group("zcols"):
            zorder = [
                c.strip()
                for c in m.group("zcols").strip().strip("()").split(",")
                if c.strip()
            ]
        where = m.group("pred").strip() if m.group("pred") else None
        version = t.optimize(zorder_by=zorder, where=where)
        d = t.detail()
        return self.spark.createDataFrame(
            [(d["location"], version, d["numFiles"])],
            "path string, version long, num_files long",
        )

    def _shallow_clone(self, s: str) -> None:
        """CREATE TABLE [IF NOT EXISTS] t SHALLOW CLONE src
        [VERSION AS OF n] LOCATION '...' — Delta's zero-copy fork DDL over
        ``AcidTable.clone_to`` (optionally of a historical version)."""
        m = re.match(
            rf"CREATE{_WS}TABLE(?:{_WS}IF{_WS}NOT{_WS}EXISTS)?{_WS}"
            rf"(?P<table>[\w.]+){_WS}SHALLOW{_WS}CLONE{_WS}(?P<src>[\w.]+)"
            rf"(?:{_WS}VERSION{_WS}AS{_WS}OF{_WS}(?P<ver>\d+))?"
            rf"(?:{_WS}LOCATION{_WS}'(?P<loc>[^']+)')?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported SHALLOW CLONE shape: {s[:120]}...")
        if not m.group("loc"):
            raise AcidSqlError(
                "SHALLOW CLONE needs LOCATION (this engine has no metastore "
                "default location)"
            )
        name = m.group("table").split(".")[-1]
        src = self.table(m.group("src").split(".")[-1])
        ver = m.group("ver")
        clone = src.clone_to(
            m.group("loc"), version=int(ver) if ver is not None else None
        )
        self.register(name, clone)
        return None

    def _create(self, s: str) -> None:
        """CREATE TABLE [IF NOT EXISTS] t [(schema)] USING DELTA
        [LOCATION '...'] [PARTITIONED BY (...)] [TBLPROPERTIES(...)] —
        the reference's create_table and register_table DDL verbatim
        (validation_suite.py:268-299).  With a column list this creates the
        table at LOCATION; without one it opens the existing table there
        (metastore-style registration).  Clauses parse order-independently,
        as Delta accepts them."""
        head_m = re.match(
            rf"CREATE{_WS}TABLE(?:{_WS}IF{_WS}NOT{_WS}EXISTS)?{_WS}(?P<table>[\w.]+)"
            rf"(?:[\s\n]*\((?P<schema>.*?)\))?{_WS}USING{_WS}DELTA(?P<rest>.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not head_m:
            raise AcidSqlError(f"unsupported CREATE TABLE shape: {s[:120]}...")
        if_not_exists = re.search(rf"IF{_WS}NOT{_WS}EXISTS", s[:60], re.IGNORECASE)
        name = head_m.group("table").split(".")[-1]  # catalog prefixes ignored
        rest = head_m.group("rest") or ""
        loc_m = re.search(rf"LOCATION{_WS}'(?P<loc>[^']+)'", rest, re.IGNORECASE)
        part_m = re.search(
            rf"PARTITIONED{_WS}BY[\s\n]*\((?P<cols>[^)]*)\)", rest, re.IGNORECASE
        )
        props_m = re.search(
            r"TBLPROPERTIES[\s\n]*\((?P<props>[^)]*)\)", rest, re.IGNORECASE
        )
        if not loc_m:
            raise AcidSqlError(
                "CREATE TABLE needs LOCATION (this engine has no metastore "
                "default location)"
            )
        location = loc_m.group("loc")
        schema_ddl = head_m.group("schema")
        if not schema_ddl:
            # register_table form: open the table that already exists there
            t = AcidTable(self.spark, location)
            if not t.log.exists():
                raise AcidSqlError(f"no ACID table found at {location}")
            self.register(name, t)
            return None
        partition_by = (
            [c.strip() for c in part_m.group("cols").split(",") if c.strip()]
            if part_m
            else []
        )
        clus_m = re.search(
            rf"CLUSTER{_WS}BY[\s\n]*\((?P<cols>[^)]*)\)", rest, re.IGNORECASE
        )
        cluster_by = (
            [c.strip() for c in clus_m.group("cols").split(",") if c.strip()]
            if clus_m
            else []
        )
        properties: dict[str, str] = {}
        if props_m:
            for assign in _split_top_level(props_m.group("props")):
                key, _, val = assign.partition("=")
                key = key.strip().strip("'\"")
                # Delta spells table properties with a 'delta.' prefix;
                # the log stores the bare name (enableChangeDataFeed)
                if key.lower().startswith("delta."):
                    key = key[len("delta.") :]
                properties[key] = val.strip().strip("'\"")
        t = AcidTable.create(
            self.spark,
            location,
            schema_ddl,
            partition_by=partition_by,
            properties=properties,
            if_not_exists=bool(if_not_exists),
            cluster_by=cluster_by,
        )
        self.register(name, t)
        return None

    def _drop(self, s: str) -> None:
        """DROP TABLE [IF EXISTS] t (ref: validation_suite.py:260-263) —
        unregisters the name; data stays on disk (external-table drop)."""
        m = re.match(
            rf"DROP{_WS}TABLE(?:{_WS}IF{_WS}EXISTS)?{_WS}(?P<table>[\w.]+)$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported DROP shape: {s[:120]}...")
        name = m.group("table").split(".")[-1]
        if_exists = re.search(rf"IF{_WS}EXISTS", s, re.IGNORECASE)
        if name not in self._tables:
            if if_exists:
                return None
            raise AcidSqlError(f"unknown ACID table {name!r}")
        del self._tables[name]
        self.spark.catalog.dropTempView(name)
        return None

    def _show(self, s: str) -> DataFrame:
        """SHOW TABLES (ref: src/validation_suite.py:239-240 ``list_tables``
        — the reference's literal statement runs verbatim) and SHOW
        PARTITIONS <table>.  Output schemas mirror Spark's own SHOW
        surface: (namespace, tableName, isTemporary) and (partition)."""
        from pyspark.sql import Row

        if re.match(rf"SHOW{_WS}TABLES$", s, re.IGNORECASE):
            return self.spark.createDataFrame(
                [
                    Row(namespace="", tableName=n, isTemporary=False)
                    for n in sorted(self._tables)
                ],
                "namespace string, tableName string, isTemporary boolean",
            )
        m = re.match(
            rf"SHOW{_WS}PARTITIONS{_WS}(?P<table>[\w.]+)$", s, re.IGNORECASE
        )
        if m:
            t = self.table(m.group("table").split(".")[-1])
            snap = t.snapshot() if hasattr(t, "snapshot") else t._t.snapshot()
            pcols = list(snap.partition_columns)
            if not pcols:
                raise AcidSqlError(
                    f"SHOW PARTITIONS: table {m.group('table')!r} is not "
                    "partitioned"
                )
            # Delta column mapping stores partitionValues under PHYSICAL
            # names; render logical ones
            phys = getattr(snap, "phys", lambda c: c)
            combos = sorted(
                {
                    tuple(
                        (a.get("partitionValues") or {}).get(phys(c))
                        for c in pcols
                    )
                    for a in snap.files.values()
                },
                key=lambda c: tuple(
                    "" if v is None else str(v) for v in c
                ),
            )
            return self.spark.createDataFrame(
                [
                    Row(
                        partition="/".join(
                            f"{c}={v}" for c, v in zip(pcols, combo)
                        )
                    )
                    for combo in combos
                ],
                "partition string",
            )
        raise AcidSqlError(f"unsupported SHOW shape: {s[:120]}...")

    def _alter(self, s: str) -> None:
        """ALTER TABLE t ADD CONSTRAINT name CHECK (expr) | DROP
        CONSTRAINT name | SET TBLPROPERTIES (k=v, …) | UNSET
        TBLPROPERTIES (k, …) — the properties forms dispatch on BOTH
        layers (ACID set_property; Delta alter_properties, which also
        carries any protocol upgrade the new properties demand)."""
        # bodies capture greedily to the FINAL ')' — [^)]* would choke on
        # nested parens like decimal(10,2) or quoted values with ')';
        # _split_top_level is paren- and quote-aware, so it gets the raw body
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}SET{_WS}"
            r"TBLPROPERTIES[\s\n]*\((?P<props>.*)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            props: dict[str, str] = {}
            for assign in _split_top_level(m.group("props")):
                key, _, val = assign.partition("=")
                props[key.strip().strip("'\"")] = val.strip().strip("'\"")
            t = self.table(m.group("table"))
            if hasattr(t, "alter_properties"):
                t.alter_properties(props)
            else:
                for k, v in props.items():
                    # the ACID log stores bare names (Delta spells them
                    # with the delta. prefix)
                    t.set_property(
                        k[len("delta."):] if k.lower().startswith("delta.")
                        else k,
                        v,
                    )
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}ADD{_WS}"
            r"COLUMNS?[\s\n]*\((?P<cols>.*)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            t = self.table(m.group("table"))
            if hasattr(t, "add_columns"):
                t.add_columns(m.group("cols"))
            else:
                for col in _split_top_level(m.group("cols")):
                    name, _, dtype = col.strip().partition(" ")
                    t.add_column(name.strip(), dtype.strip())
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}RENAME{_WS}COLUMN"
            rf"{_WS}(?P<old>\w+){_WS}TO{_WS}(?P<new>\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            t = self.table(m.group("table"))
            if not hasattr(t, "rename_column"):
                raise AcidSqlError(
                    "RENAME COLUMN is supported on Delta tables only"
                )
            t.rename_column(m.group("old"), m.group("new"))
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}DROP{_WS}COLUMN"
            rf"{_WS}(?P<col>\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            t = self.table(m.group("table"))
            if not hasattr(t, "drop_column"):
                raise AcidSqlError(
                    "DROP COLUMN is supported on Delta tables only"
                )
            t.drop_column(m.group("col"))
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}UNSET{_WS}"
            r"TBLPROPERTIES[\s\n]*\((?P<keys>.*)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            keys = [
                k.strip().strip("'\"")
                for k in m.group("keys").split(",")
                if k.strip()
            ]
            t = self.table(m.group("table"))
            if not hasattr(t, "alter_properties"):
                raise AcidSqlError(
                    "UNSET TBLPROPERTIES is supported on Delta tables only"
                )
            t.alter_properties(unset=keys)
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}ADD{_WS}CONSTRAINT{_WS}"
            rf"(?P<name>\w+){_WS}CHECK[\s\n]*\((?P<expr>.+)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            self.table(m.group("table")).add_constraint(
                m.group("name"), m.group("expr").strip()
            )
            return None
        m = re.match(
            rf"ALTER{_WS}TABLE{_WS}(?P<table>\w+){_WS}DROP{_WS}CONSTRAINT{_WS}"
            rf"(?P<name>\w+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            self.table(m.group("table")).drop_constraint(m.group("name"))
            return None
        raise AcidSqlError(f"unsupported ALTER shape: {s[:120]}...")

    def _restore(self, s: str) -> None:
        """RESTORE TABLE t TO VERSION|TIMESTAMP AS OF ... (Delta RESTORE)."""
        m = re.match(
            rf"RESTORE{_WS}TABLE{_WS}(?P<table>\w+){_WS}TO{_WS}"
            rf"(?P<kind>VERSION|TIMESTAMP){_WS}AS{_WS}OF{_WS}"
            rf"(?:(?P<ver>\d+)|'(?P<ts>[^']+)')$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported RESTORE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        if m.group("kind").upper() == "VERSION":
            if m.group("ver") is None:
                raise AcidSqlError("RESTORE ... VERSION AS OF needs an integer")
            t.restore(int(m.group("ver")))
        else:
            if m.group("ts") is None:
                raise AcidSqlError("RESTORE ... TIMESTAMP AS OF needs a quoted timestamp")
            t.restore(t.log.version_for_timestamp(m.group("ts")))
        return None

    def _describe(self, s: str) -> DataFrame:
        """DESCRIBE HISTORY/DETAIL <table> (ref: validation_suite.py:244-259)."""
        m = re.match(
            rf"DESCRIBE{_WS}(?P<what>HISTORY|DETAIL){_WS}(?P<table>\w+)$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise AcidSqlError(f"unsupported DESCRIBE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        if m.group("what").upper() == "HISTORY":
            rows = [
                (h["version"], h["timestamp"], h["operation"])
                for h in t.history()
            ]
            return self.spark.createDataFrame(
                rows, "version long, timestamp string, operation string"
            )
        d = t.detail()
        return self.spark.createDataFrame(
            [(d["location"], d["numFiles"], d["sizeInBytes"], d["version"])],
            "location string, numFiles long, sizeInBytes long, version long",
        )

    # ----------------------------------------------------------------- DML
    def _insert(self, s: str) -> None:
        ow = re.match(
            rf"INSERT{_WS}OVERWRITE(?:{_WS}TABLE)?{_WS}(?P<table>\w+)"
            rf"(?:{_WS}PARTITION[\s\n]*\((?P<part>[^)]*)\))?"
            rf"{_WS}(?P<body>(?:SELECT|VALUES)\b.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if ow:
            return self._insert_overwrite(ow)
        rw = re.match(
            rf"INSERT{_WS}INTO{_WS}(?P<table>\w+)"
            rf"{_WS}REPLACE{_WS}WHERE{_WS}(?P<pred>.+?)"
            rf"{_WS}(?P<body>(?:SELECT|VALUES)\b.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if rw:
            # Delta's predicate-scoped atomic overwrite (SQL form of
            # option("replaceWhere")); ACID registrations refuse with a
            # typed error via the adapter's __getattr__
            t = self.table(rw.group("table"))
            body = rw.group("body")
            if body.upper().startswith("VALUES"):
                cols = ", ".join(t.schema().fieldNames())
                df = self.spark.sql(
                    f"SELECT * FROM ({body}) AS __v({cols})"
                )
            else:
                df = self.spark.sql(body)
            fn = getattr(t, "overwrite_where", None)
            if fn is None:
                raise AcidSqlError(
                    "REPLACE WHERE is not implemented for ACID-registered "
                    "tables; register the Delta table via register_delta"
                )
            fn(df, rw.group("pred").strip())
            return None
        m = re.match(
            rf"INSERT{_WS}INTO{_WS}(?P<table>\w+)"
            rf"(?:{_WS}PARTITION[\s\n]*\((?P<part>[^)]*)\))?"
            rf"(?:[\s\n]*\((?P<cols>[^)]*)\))?"
            rf"{_WS}VALUES[\s\n]*(?P<values>\(.*\))$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(f"unsupported INSERT shape: {s[:120]}...")
        t = self.table(m.group("table"))
        schema = t.schema()
        values_sql = m.group("values")
        part_assigns: list[tuple[str, str]] = []
        if m.group("part"):
            for assign in _split_top_level(m.group("part")):
                col, _, lit = assign.partition("=")
                part_assigns.append((col.strip(), lit.strip()))
        by_lower = {c.lower(): c for c in schema.fieldNames()}

        def _resolve(name: str) -> str:
            actual = by_lower.get(name.lower())
            if actual is None:
                raise AcidSqlError(f"INSERT references unknown column {name!r}")
            return actual

        part_assigns = [(_resolve(c), lit) for c, lit in part_assigns]
        if m.group("cols"):
            cols = [_resolve(c.strip()) for c in _split_top_level(m.group("cols"))]
        else:
            # static-partition INSERT without a column list: VALUES supplies
            # every non-partition-clause column, in schema order
            part_names = {c for c, _ in part_assigns}
            cols = [c for c in schema.fieldNames() if c not in part_names]
        # VALUES tuples evaluate through Catalyst — cast/date/timestamp
        # literals behave exactly as in the reference's spark.sql INSERT
        df = self.spark.sql(f"SELECT * FROM (VALUES {values_sql}) AS __v({', '.join(cols)})")
        for col, lit in part_assigns:
            df = df.withColumn(col, F.expr(lit))
        missing = [c for c in schema.fieldNames() if c not in df.columns]
        if missing:
            raise AcidSqlError(f"INSERT leaves columns unset: {missing}")
        # positional order; type coercion happens in _stage_write
        t.append(df.select(*schema.fieldNames()))
        return None

    def _delete(self, s: str) -> None:
        m = re.match(
            rf"DELETE{_WS}FROM{_WS}(?P<table>\w+)(?:{_WS}WHERE{_WS}(?P<pred>.+))?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(f"unsupported DELETE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        t.delete(m.group("pred").strip() if m.group("pred") else None)
        return None

    def _update(self, s: str) -> None:
        m = re.match(
            rf"UPDATE{_WS}(?P<table>\w+){_WS}SET{_WS}(?P<rest>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(f"unsupported UPDATE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        # the SET/WHERE boundary is found lexically (outside quotes and
        # parens): a WHERE inside a string literal or subquery must not
        # truncate the assignments
        sets_sql, pred = _split_at_top_keyword(m.group("rest"), "WHERE")
        by_lower = {c.lower(): c for c in t.schema().fieldNames()}
        assignments: dict[str, str] = {}
        for part in _split_top_level(sets_sql):
            col, eq, expr = part.partition("=")
            if not eq:
                raise AcidSqlError(f"bad SET clause: {part!r}")
            name = col.strip()
            actual = by_lower.get(name.lower())
            if actual is None:
                # SQL identifiers are case-insensitive: an unknown column is
                # an error, never a silent no-op
                raise AcidSqlError(f"UPDATE SET references unknown column {name!r}")
            assignments[actual] = expr.strip()
        t.update(assignments, pred if pred else "true")
        return None

    def _merge_delete_forms(self, s: str) -> bool:
        """Delete-clause MERGE shapes (beyond the reference's upsert):

        ``WHEN MATCHED [AND pred] THEN DELETE`` and/or
        ``WHEN NOT MATCHED BY SOURCE [AND pred] THEN DELETE`` —
        dispatched to the multi-clause ``DeltaTable.merge``.  Returns
        False when the statement is not one of these shapes (the caller
        falls through to the upsert parser)."""
        m = re.match(
            rf"MERGE{_WS}INTO{_WS}(?P<target>\w+)"
            rf"(?:{_WS}AS{_WS}(?P<talias>\w+)|{_WS}(?!USING)(?P<talias2>\w+))?"
            rf"{_WS}USING{_WS}(?P<source>\w+)"
            rf"(?:{_WS}AS{_WS}(?P<salias>\w+)|{_WS}(?!ON)(?P<salias2>\w+))?"
            rf"{_WS}ON{_WS}(?P<on>.+?)"
            rf"(?:{_WS}WHEN{_WS}MATCHED(?:{_WS}AND{_WS}(?P<mpred>.+?))?"
            rf"{_WS}THEN{_WS}DELETE)?"
            rf"(?:{_WS}WHEN{_WS}NOT{_WS}MATCHED{_WS}BY{_WS}SOURCE"
            rf"(?:{_WS}AND{_WS}(?P<bpred>.+?))?{_WS}THEN{_WS}DELETE"
            rf"(?P<bs>))?\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m or "DELETE" not in s.upper():
            return False
        has_matched = re.search(
            rf"WHEN{_WS}MATCHED(?:{_WS}AND.+?)?{_WS}THEN{_WS}DELETE",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        has_bs = m.group("bs") is not None
        if not has_matched and not has_bs:
            return False
        t = self.table(m.group("target"))
        if not hasattr(t, "merge_clauses"):
            raise AcidSqlError(
                "MERGE delete clauses are supported on Delta interop tables "
                "(register_delta); ACID tables take the upsert shape only"
            )
        src_name = m.group("source")
        source = (
            self._tables[src_name].read()
            if src_name in self._tables
            else self.spark.table(src_name)
        )
        keys = self._merge_on_keys(m.group("on"))
        aliases = [
            a
            for a in (
                m.group("target"),
                m.group("talias"),
                m.group("talias2"),
            )
            if a
        ]

        def _unqualify(pred: str | None) -> str | None:
            if pred is None:
                return None
            out = pred.strip()
            for a in aliases:
                out = re.sub(rf"\b{re.escape(a)}\.", "", out)
            return out

        t.merge_clauses(
            source,
            keys,
            matched="delete" if has_matched else None,
            matched_predicate=_unqualify(m.group("mpred")),
            not_matched=None,
            not_matched_by_source="delete" if has_bs else None,
            not_matched_by_source_predicate=_unqualify(m.group("bpred")),
        )
        return True

    @staticmethod
    def _merge_on_keys(on: str) -> list[str]:
        keys = []
        for clause in re.split(rf"{_WS}AND{_WS}", on, flags=re.IGNORECASE):
            eq = re.match(
                r"\s*(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)\s*$", clause
            )
            if not eq or eq.group(1) != eq.group(2):
                raise AcidSqlError(
                    f"MERGE ON must be key equality; got {clause!r}"
                )
            keys.append(eq.group(1))
        return keys

    def _merge(self, s: str) -> None:
        if self._merge_delete_forms(s):
            return None
        m = re.match(
            rf"MERGE{_WS}INTO{_WS}(?P<target>\w+)"
            rf"(?:{_WS}AS{_WS}(?P<talias>\w+)|{_WS}(?!USING)(?P<talias2>\w+))?"
            rf"{_WS}USING{_WS}(?P<source>\w+)"
            rf"(?:{_WS}AS{_WS}(?P<salias>\w+)|{_WS}(?!ON)(?P<salias2>\w+))?"
            rf"{_WS}ON{_WS}(?P<on>.+?)"
            rf"{_WS}WHEN{_WS}MATCHED{_WS}THEN{_WS}UPDATE{_WS}SET{_WS}(?P<sets>.+?)"
            rf"{_WS}WHEN{_WS}NOT{_WS}MATCHED[\s\n]+(?:THEN[\s\n]+)?INSERT[\s\n]*"
            rf"\((?P<icols>[^)]*)\)[\s\n]*VALUES[\s\n]*\((?P<ivals>.*)\)[\s\n]*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(
                "unsupported MERGE shape (expected the reference's upsert "
                "WHEN MATCHED UPDATE SET … WHEN NOT MATCHED INSERT …, or a "
                f"delete-clause form): {s[:120]}..."
            )
        t = self.table(m.group("target"))
        # AcidTable.merge is a full-row SOURCE upsert; dispatching anything
        # else there would silently compute the wrong table.  Verify the
        # statement really has that meaning: every target column assigned,
        # every RHS the SAME column from the source (qualified by the source
        # name/alias or bare), and the INSERT an identity mapping of source
        # columns — arithmetic SETs, constants, or reordered INSERTs raise.
        src_q = {
            q.lower()
            for q in (m.group("source"), m.group("salias"), m.group("salias2"))
            if q
        }

        def _is_source_col(expr: str, col: str) -> bool:
            e = expr.strip().lower()
            if e == col.lower():
                return True
            qual, dot, name = e.partition(".")
            return bool(dot) and qual in src_q and name == col.lower()

        set_cols = set()
        for part in _split_top_level(m.group("sets")):
            col, eq, expr = part.partition("=")
            if not eq:
                raise AcidSqlError(f"bad MERGE SET clause: {part!r}")
            cname = col.strip().split(".")[-1]
            if not _is_source_col(expr, cname):
                raise AcidSqlError(
                    "only full-row source upserts are supported: SET "
                    f"{cname} = {expr.strip()!r} is not the source's {cname}"
                )
            set_cols.add(cname.lower())
        unassigned = [
            c for c in t.schema().fieldNames() if c.lower() not in set_cols
        ]
        if unassigned:
            raise AcidSqlError(
                "only full-row MERGE upserts are supported (the reference's "
                f"shape); UPDATE SET leaves columns unassigned: {unassigned}"
            )
        icols = [c.strip() for c in _split_top_level(m.group("icols"))]
        ivals = [v.strip() for v in _split_top_level(m.group("ivals"))]
        if len(icols) != len(ivals) or not icols:
            raise AcidSqlError("MERGE INSERT column/value lists differ in length")
        for c, v in zip(icols, ivals):
            if not _is_source_col(v, c.split(".")[-1]):
                raise AcidSqlError(
                    "only full-row source upserts are supported: INSERT maps "
                    f"{c} from {v!r}, not the source's {c}"
                )
        src_name = m.group("source")
        if src_name in self._tables:
            source = self._tables[src_name].read()
        else:
            source = self.spark.table(src_name)
        # equality keys from the ON conjunction: <q>.k = <q>.k [AND ...]
        keys = []
        for clause in re.split(rf"{_WS}AND{_WS}", m.group("on"), flags=re.IGNORECASE):
            eq = re.match(r"\s*(?:\w+\.)?(\w+)\s*=\s*(?:\w+\.)?(\w+)\s*$", clause)
            if not eq or eq.group(1) != eq.group(2):
                raise AcidSqlError(f"MERGE ON must be key equality; got {clause!r}")
            keys.append(eq.group(1))
        t.merge(source, keys)
        return None

    # --------------------------------------------------------------- query
    _TC = re.compile(r"table_changes\s*\(\s*'(?P<table>\w+)'\s*,\s*(?P<ver>\d+)\s*\)", re.IGNORECASE)
    _VER = re.compile(
        r"\b(?P<table>\w+)\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)", re.IGNORECASE
    )
    _TS = re.compile(
        r"\b(?P<table>\w+)\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'", re.IGNORECASE
    )

    def _query(self, s: str) -> DataFrame:
        def expand_tc(m: re.Match) -> str:
            t = self.table(m.group("table"))
            view = f"__tc_{m.group('table')}_{m.group('ver')}"
            t.read_changes(int(m.group("ver"))).createOrReplaceTempView(view)
            return view

        def expand_ver(m: re.Match) -> str:
            t = self.table(m.group("table"))
            view = f"__v_{m.group('table')}_{m.group('ver')}"
            t.read(version=int(m.group("ver"))).createOrReplaceTempView(view)
            return view

        def expand_ts(m: re.Match) -> str:
            t = self.table(m.group("table"))
            view = f"__ts_{m.group('table')}_{abs(hash(m.group('ts')))}"
            t.read(timestamp=m.group("ts")).createOrReplaceTempView(view)
            return view

        # rewrites and view registration are quote-aware: time-travel
        # syntax INSIDE a string literal is data, not a table reference
        s = _sub_outside_quotes(self._TC, expand_tc, s)
        s = _sub_outside_quotes(self._VER, expand_ver, s)
        s = _sub_outside_quotes(self._TS, expand_ts, s)
        spans = _quote_spans(s)
        for name, t in self._tables.items():
            hits = [
                mm for mm in re.finditer(rf"\b{re.escape(name)}\b", s)
                if not any(a <= mm.start() < b for a, b in spans)
            ]
            if hits:
                t.read().createOrReplaceTempView(name)
        return self.spark.sql(s)
