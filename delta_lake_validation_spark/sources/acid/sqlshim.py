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
    """Split on ``sep`` outside parentheses and quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
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
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


class AcidSqlContext:
    """Name → AcidTable registry plus the ``sql()`` dispatcher."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, AcidTable] = {}

    def register(self, name: str, table: AcidTable) -> None:
        self._tables[name] = table

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
        return self._query(s)

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

    def _alter(self, s: str) -> None:
        """ALTER TABLE t ADD CONSTRAINT name CHECK (expr) | DROP CONSTRAINT name."""
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
        if m.group("cols"):
            cols = [c.strip() for c in _split_top_level(m.group("cols"))]
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
            rf"UPDATE{_WS}(?P<table>\w+){_WS}SET{_WS}(?P<sets>.+?)"
            rf"(?:{_WS}WHERE{_WS}(?P<pred>.+))?$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(f"unsupported UPDATE shape: {s[:120]}...")
        t = self.table(m.group("table"))
        assignments: dict[str, str] = {}
        for part in _split_top_level(m.group("sets")):
            col, eq, expr = part.partition("=")
            if not eq:
                raise AcidSqlError(f"bad SET clause: {part!r}")
            assignments[col.strip()] = expr.strip()
        pred = m.group("pred").strip() if m.group("pred") else "true"
        t.update(assignments, pred)
        return None

    def _merge(self, s: str) -> None:
        m = re.match(
            rf"MERGE{_WS}INTO{_WS}(?P<target>\w+)(?:{_WS}AS{_WS}\w+|{_WS}(?!USING)\w+)?"
            rf"{_WS}USING{_WS}(?P<source>\w+)(?:{_WS}AS{_WS}\w+|{_WS}(?!ON)\w+)?"
            rf"{_WS}ON{_WS}(?P<on>.+?)"
            rf"{_WS}WHEN{_WS}MATCHED{_WS}THEN{_WS}UPDATE{_WS}SET{_WS}(?P<sets>.+?)"
            rf"{_WS}WHEN{_WS}NOT{_WS}MATCHED[\s\n]+(?:THEN[\s\n]+)?INSERT[\s\n]*\(.+",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise AcidSqlError(
                "unsupported MERGE shape (expected the reference's upsert: "
                f"WHEN MATCHED UPDATE SET …, WHEN NOT MATCHED INSERT …): {s[:120]}..."
            )
        t = self.table(m.group("target"))
        # AcidTable.merge is full-row upsert; dispatching a partial-column
        # SET there would silently overwrite unlisted columns — verify the
        # statement assigns every target column (col = <source>.col)
        set_cols = set()
        for part in _split_top_level(m.group("sets")):
            col, eq, _expr = part.partition("=")
            if eq:
                set_cols.add(col.strip().split(".")[-1].lower())
        unassigned = [
            c for c in t.schema().fieldNames() if c.lower() not in set_cols
        ]
        if unassigned:
            raise AcidSqlError(
                "only full-row MERGE upserts are supported (the reference's "
                f"shape); UPDATE SET leaves columns unassigned: {unassigned}"
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

        s = self._TC.sub(expand_tc, s)
        s = self._VER.sub(expand_ver, s)
        s = self._TS.sub(expand_ts, s)
        for name, t in self._tables.items():
            if re.search(rf"\b{re.escape(name)}\b", s):
                t.read().createOrReplaceTempView(name)
        return self.spark.sql(s)
