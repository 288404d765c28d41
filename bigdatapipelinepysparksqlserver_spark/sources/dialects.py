"""JDBC dialect adapters (VERDICT r8 #4 — the seam
``JdbcMartPublisher`` anticipated, filled in).

The engine's JDBC layer is dialect-generic and integration-tested
against embedded Derby; the REFERENCE speaks real T-SQL over SQL
Server (`pipeline_scripts/sql_conn.py:20-24` connection;
`load_sales_mart.py:92-101` BEGIN TRAN / TRUNCATE / INSERT-SELECT /
COMMIT swap). A dialect object owns exactly the statements that differ
per engine:

- **DDL type mapping** for explicit column types on writer-created
  tables (SQL Server: NVARCHAR instead of the TEXT/CLOB-ish defaults,
  DATETIME2 instead of DATETIME's 3.33 ms rounding — the reference's
  own schema uses datetime2-compatible stamps);
- **empty-clone DDL** for the first publish (standard
  ``CREATE TABLE .. AS .. WITH NO DATA`` vs T-SQL's
  ``SELECT * INTO .. WHERE 1 = 0``);
- **swap statements** (generic: DELETE + INSERT-SELECT —
  transactional everywhere; SQL Server: TRUNCATE TABLE + INSERT-SELECT
  — TRUNCATE participates in transactions in T-SQL, matching
  load_sales_mart.py:96-99 verbatim, with optional
  ``SET IDENTITY_INSERT`` bracketing so a mart table carrying an
  IDENTITY column accepts staged ids);
- **TOP-N scalar lookups** (``SELECT TOP (n)`` vs standard
  ``FETCH FIRST n ROWS ONLY``) for pushdown subqueries.

Statements are PURE — built as text, executed by the publisher — so
the T-SQL contract is unit-testable without a SQL Server (statement-
text assertions), while the generic dialect keeps the Derby
integration matrix authoritative for the execution path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class JdbcDialect:
    """Generic / SQL-standard dialect — what the Derby matrix runs."""

    name = "generic"

    #: Spark simpleString -> explicit DDL type for writer-created
    #: tables; types absent here use the Spark JDBC writer's default.
    TYPE_DDL: dict[str, str] = {"string": "VARCHAR(64)"}

    def create_column_types(self, df: DataFrame) -> str | None:
        """``createTableColumnTypes`` override string for ``df`` (None
        when every column can take the writer default)."""
        cols = [
            f"{f.name} {self.TYPE_DDL[f.dataType.typeName()]}"
            for f in df.schema.fields
            if f.dataType.typeName() in self.TYPE_DDL
        ]
        return ", ".join(cols) or None

    def create_empty_like(self, table: str, source: str) -> str:
        """DDL cloning ``source``'s shape into an EMPTY ``table``."""
        return f"CREATE TABLE {table} AS SELECT * FROM {source} WITH NO DATA"

    def swap_statements(
        self,
        table: str,
        staging: str,
        identity_insert: bool = False,
        columns: list[str] | None = None,
    ) -> list[str]:
        """The transactional truncate-and-fill swap, as an ordered
        statement list executed inside ONE transaction. DELETE (not
        TRUNCATE) keeps the rollback guarantee unconditional across
        dialects. ``columns`` (when known) makes the INSERT's column
        list explicit — required by the SQL Server dialect's
        IDENTITY_INSERT path, positional-safe everywhere else."""
        cols = f" ({', '.join(columns)})" if columns else ""
        body = ", ".join(columns) if columns else "*"
        return [
            f"DELETE FROM {table}",
            f"INSERT INTO {table}{cols} SELECT {body} FROM {staging}",
        ]

    def top_n(self, select_body: str, n: int, order_by: str | None = None) -> str:
        """A bounded scalar/top-k lookup subquery (the reference's
        ``SELECT TOP 1`` ledger probes, run_control queries)."""
        order = f" ORDER BY {order_by}" if order_by else ""
        return f"SELECT {select_body}{order} FETCH FIRST {int(n)} ROWS ONLY"


class SqlServerDialect(JdbcDialect):
    """T-SQL — the reference's actual target
    (`sql_conn.py:20-24`, `load_sales_mart.py:92-101`)."""

    name = "sqlserver"

    TYPE_DDL = {
        # NVARCHAR: the reference schema's Unicode-safe string type;
        # bounded so equality predicates push down and index sanely
        "string": "NVARCHAR(64)",
        # DATETIME2(6): micros precision, no DATETIME 3.33 ms rounding —
        # cutoff arithmetic (F6) must survive the round-trip exactly
        "timestamp": "DATETIME2(6)",
        "timestamp_ntz": "DATETIME2(6)",
        # FLOAT is T-SQL's 8-byte double (DOUBLE PRECISION is alias,
        # but FLOAT is the conventional spelling)
        "double": "FLOAT",
        "boolean": "BIT",
    }

    def create_empty_like(self, table: str, source: str) -> str:
        # T-SQL has no CREATE TABLE AS; SELECT INTO with a false
        # predicate clones column names/types/nullability
        return f"SELECT * INTO {table} FROM {source} WHERE 1 = 0"

    def swap_statements(
        self,
        table: str,
        staging: str,
        identity_insert: bool = False,
        columns: list[str] | None = None,
    ) -> list[str]:
        # TRUNCATE TABLE is fully transactional in T-SQL (logs page
        # deallocations), so the reference's BEGIN TRAN; TRUNCATE;
        # INSERT; COMMIT (load_sales_mart.py:96-99) keeps the
        # rollback-to-previous-snapshot guarantee while skipping
        # DELETE's per-row logging on a mart-sized table.
        if identity_insert:
            # a mart table with an IDENTITY id must accept the staged
            # ids verbatim — without the bracket the INSERT-SELECT
            # throws error 544 and the publish rolls back. T-SQL
            # additionally REQUIRES an explicit column list under
            # SET IDENTITY_INSERT ON (error 8101 on ``INSERT ...
            # SELECT *``), so the caller must supply the staging
            # schema's columns (JdbcMartPublisher reads them from
            # connection metadata when not passed).
            if not columns:
                raise ValueError(
                    "SqlServerDialect.swap_statements(identity_insert=True)"
                    " requires an explicit column list: T-SQL rejects"
                    " INSERT .. SELECT * under SET IDENTITY_INSERT ON"
                    " (error 8101)"
                )
            col_list = ", ".join(columns)
            return [
                f"TRUNCATE TABLE {table}",
                f"SET IDENTITY_INSERT {table} ON",
                f"INSERT INTO {table} ({col_list})"
                f" SELECT {col_list} FROM {staging}",
                f"SET IDENTITY_INSERT {table} OFF",
            ]
        cols = f" ({', '.join(columns)})" if columns else ""
        body = ", ".join(columns) if columns else "*"
        return [
            f"TRUNCATE TABLE {table}",
            f"INSERT INTO {table}{cols} SELECT {body} FROM {staging}",
        ]

    def top_n(self, select_body: str, n: int, order_by: str | None = None) -> str:
        order = f" ORDER BY {order_by}" if order_by else ""
        return f"SELECT TOP ({int(n)}) {select_body}{order}"


def sqlserver_jdbc_url(
    host: str, database: str, port: int = 1433, encrypt: bool = True
) -> str:
    """The sqljdbc connection string for the reference's server/database
    pair (`sql_conn.py:20-24` builds the pymssql equivalent from
    config)."""
    enc = "true" if encrypt else "false"
    return (
        f"jdbc:sqlserver://{host}:{port};databaseName={database};"
        f"encrypt={enc};trustServerCertificate=true"
    )
