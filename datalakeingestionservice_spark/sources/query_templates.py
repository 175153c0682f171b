"""Named query templates — the engine's model for stored procedures/packages.

The reference invokes opaque RDBMS procedures (`dbo.sp_GetDailyTrades`,
`HR_PKG.GET_EMPLOYEE_DATA`) whose SQL lives in the database. Our engine IS the
executor, so a "stored procedure" is a named, parameterized SQL template
registered here and executed via ``spark.sql(sql, args=...)`` over lake views
(SURVEY.md A2/A3 mapping). Parameter markers use Spark's named-parameter
syntax ``:name``.
"""

from __future__ import annotations

QUERY_TEMPLATES: dict[str, str] = {}


def register_query_template(name: str, sql: str) -> None:
    """Register (or replace) a named query template. Names are matched
    case-insensitively, like the reference's proc-name handling."""
    QUERY_TEMPLATES[name.lower()] = sql


def get_query_template(name: str) -> str:
    try:
        return QUERY_TEMPLATES[name.lower()]
    except KeyError:
        raise KeyError(
            f"no query template registered for {name!r} "
            f"(known: {sorted(QUERY_TEMPLATES)})"
        ) from None


# The reference's shipped procedures, re-expressed over the lake schema.
register_query_template(
    "dbo.sp_GetDailyTrades",
    # Shape parity with GetDailyTrades.sql:4-16 (projection + BETWEEN + sort),
    # on the lineitem fact (FIXTURES.md F1 mapping).
    """
    SELECT l_orderkey * 10 + l_linenumber AS trade_id,
           CAST(l_shipdate AS DATE)       AS trade_date,
           l_quantity                     AS quantity,
           l_extendedprice                AS price,
           round(l_quantity * l_extendedprice, 2) AS total_amount,
           l_suppkey                      AS account_id
    FROM lineitem
    WHERE l_shipdate BETWEEN :StartDate AND :EndDate
    ORDER BY trade_date DESC, trade_id
    """,
)

register_query_template(
    "HR_PKG.GET_EMPLOYEE_DATA",
    # dataset-hr-oracle.json params p_department_id (0 = all), p_active_only.
    # customer plays the employee table (FIXTURES.md F2 mapping); column names
    # match the dataset's requiredColumns contract (EMPLOYEE_ID, EMAIL,
    # HIRE_DATE — dataset-hr-oracle.json:38) so the reference config's
    # DataValidation step passes unmodified.
    """
    SELECT c_custkey     AS EMPLOYEE_ID,
           c_name        AS FULL_NAME,
           lower(replace(c_name, '#', '')) || '@corp.example.com' AS EMAIL,
           timestampadd(DAY, CAST(c_custkey % 3650 AS INT),
                        TIMESTAMP '2010-01-01 00:00:00') AS HIRE_DATE,
           c_nationkey   AS DEPARTMENT_ID,
           CASE WHEN c_acctbal >= 0 THEN 'Y' ELSE 'N' END AS ACTIVE_FLAG,
           round(c_acctbal, 2) AS BALANCE
    FROM customer
    WHERE (:p_department_id = 0 OR c_nationkey = :p_department_id)
      AND (:p_active_only <> 'Y' OR c_acctbal >= 0)
    ORDER BY EMPLOYEE_ID
    """,
)
