"""PostgreSQL → Spark SQL dialect shims.

The DML's ``expression:`` / ``constraints:`` / ``query:`` strings are
opaque PostgreSQL SQL (reference SURVEY §2.2). Most of the observed
surface parses under Spark SQL unchanged (``extract``, ``substring``,
``position(x IN s)``, ``||``, ``CASE``, ``IN (subquery)``, ``VALUES``
inline tables). Three constructs need rewriting:

* ``expr::type`` casts → ``CAST(expr AS type)`` with a Postgres→Spark
  type mapping (reference tests/rules/custom_query.yaml uses
  ``0::int, 1::numeric``).
* ``SELECT DISTINCT ON (keys) …`` → a deterministic
  ``row_number() OVER (PARTITION BY keys ORDER BY …) = 1`` subquery
  (reference validation/location.yaml). Spark has no DISTINCT ON.
* pl/pgsql ``CREATE FUNCTION`` scripts → not translatable; callers must
  register an equivalent Spark UDF (detected via
  :func:`is_plpgsql_script`).

Everything here is a best-effort source rewrite of *user-supplied* SQL;
our own generated plans never round-trip through these shims.
"""

from __future__ import annotations

import re

__all__ = [
    "translate",
    "rewrite_casts",
    "rewrite_distinct_on",
    "spark_type",
    "is_plpgsql_script",
]

# Postgres type name → Spark SQL type (SURVEY §1.4). Parameterized
# varchar/char collapse to STRING (Spark strings are unbounded).
_TYPE_MAP = {
    "int": "INT",
    "int4": "INT",
    "integer": "INT",
    "smallint": "SMALLINT",
    "int2": "SMALLINT",
    "bigint": "BIGINT",
    "int8": "BIGINT",
    "serial": "BIGINT",
    "bigserial": "BIGINT",
    "numeric": "DECIMAL(38,18)",
    "decimal": "DECIMAL(38,18)",
    "real": "FLOAT",
    "float4": "FLOAT",
    "float": "DOUBLE",
    "float8": "DOUBLE",
    "double precision": "DOUBLE",
    "text": "STRING",
    "varchar": "STRING",
    "char": "STRING",
    "character": "STRING",
    "character varying": "STRING",
    "bool": "BOOLEAN",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMP",
    "time": "STRING",
    "uuid": "STRING",
    "json": "STRING",
    "jsonb": "STRING",
    "bytea": "BINARY",
}

_PARAM_RE = re.compile(r"\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\)\s*\Z")


def spark_type(pg_type: str) -> str:
    """Map a Postgres DDL type string to a Spark SQL type string."""
    t = pg_type.strip().lower()
    m = _PARAM_RE.search(t)
    params = ""
    if m:
        base = t[: m.start()].strip()
        params = m.group(0).strip()
    else:
        base = t
    if base in ("numeric", "decimal") and params:
        return f"DECIMAL{params}"
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    # unknown → pass through; Spark will validate
    return pg_type.strip().upper()


_PLPGSQL_RE = re.compile(
    r"create\s+(or\s+replace\s+)?(function|procedure)\b", re.IGNORECASE
)


def is_plpgsql_script(script: str) -> bool:
    return bool(_PLPGSQL_RE.search(script))


# --- ``::`` cast rewriting ---------------------------------------------------

# the type after ``::``: one word, or a known two-word type, plus
# optional (n[,m]) params. A greedy two-word match would swallow
# following keywords (``x::bigint as y``).
_CAST_TYPE_RE = re.compile(
    r"((?:double\s+precision|character\s+varying|\w+))"
    r"(\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?",
    re.IGNORECASE,
)


def _operand_start(sql: str, pos: int) -> int:
    """Walk backwards from ``pos`` (index just past the operand) to
    find where the ``::`` operand begins: a parenthesized group, a
    quoted literal, or an identifier/number chain."""
    i = pos - 1
    if i < 0:
        return pos
    c = sql[i]
    if c == ")":
        depth = 0
        while i >= 0:
            if sql[i] == ")":
                depth += 1
            elif sql[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        start = max(i, 0)
        # include a preceding function name: f(x)::t
        j = start - 1
        while j >= 0 and (sql[j].isalnum() or sql[j] in "_."):
            j -= 1
        return j + 1
    if c == "'":
        i -= 1
        while i >= 0:
            if sql[i] == "'":
                # handle '' escapes
                if i > 0 and sql[i - 1] == "'":
                    i -= 2
                    continue
                break
            i -= 1
        return max(i, 0)
    j = i
    while j >= 0 and (sql[j].isalnum() or sql[j] in "_.$"):
        j -= 1
    return j + 1


def rewrite_casts(sql: str) -> str:
    """Rewrite every ``operand::type`` into ``CAST(operand AS type)``."""
    while True:
        idx = sql.find("::")
        if idx < 0:
            return sql
        m = _CAST_TYPE_RE.match(sql, idx + 2)
        if not m:
            # not a cast we understand; leave the rest untouched
            return sql
        type_str = m.group(0).strip()
        start = _operand_start(sql, idx)
        operand = sql[start:idx]
        replacement = f"CAST({operand} AS {spark_type(type_str)})"
        sql = sql[:start] + replacement + sql[m.end():]


# --- DISTINCT ON rewriting ---------------------------------------------------

_DISTINCT_ON_RE = re.compile(r"select\s+distinct\s+on\s*\(", re.IGNORECASE)
_BRANCH_END_RE = re.compile(r"\b(union|intersect|except|order\s+by|limit)\b", re.IGNORECASE)


def _matching_paren(sql: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parentheses in SQL: {sql[open_idx:open_idx+40]!r}")


def _top_level_find(sql: str, pattern: re.Pattern, start: int = 0) -> re.Match | None:
    """First match of ``pattern`` at paren depth 0, skipping quotes."""
    depth = 0
    i = start
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return None
        elif c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif depth == 0:
            m = pattern.match(sql, i)
            if m:
                return m
        i += 1
    return None


_FROM_RE = re.compile(r"\bfrom\b", re.IGNORECASE)


def rewrite_distinct_on(sql: str) -> str:
    """Rewrite each ``SELECT DISTINCT ON (k) sel FROM tail`` branch into

    ``SELECT sel FROM (SELECT *, row_number() OVER (PARTITION BY k
    ORDER BY k, sel…) AS __don_rn FROM tail) __don_<i> WHERE __don_rn = 1``

    Postgres picks an arbitrary row per key group when no ORDER BY
    disambiguates; we instead order deterministically by the partition
    keys then the projected columns (documented deviation, SURVEY §4.4).
    Branch ``tail`` ends at a top-level UNION/INTERSECT/EXCEPT/ORDER
    BY/LIMIT or end of string, so set operations of DISTINCT ON
    branches (validation/location.yaml) rewrite branch-by-branch.
    """
    counter = 0
    while True:
        m = _DISTINCT_ON_RE.search(sql)
        if not m:
            return sql
        open_idx = sql.index("(", m.end() - 1)
        close_idx = _matching_paren(sql, open_idx)
        keys = sql[open_idx + 1 : close_idx].strip()

        rest = sql[close_idx + 1 :]
        from_m = _top_level_find(rest, _FROM_RE)
        if not from_m:
            raise ValueError("DISTINCT ON without FROM is unsupported")
        select_list = rest[: from_m.start()].strip()
        after_from = rest[from_m.end() :]
        end_m = _top_level_find(after_from, _BRANCH_END_RE)
        tail_end = end_m.start() if end_m else len(after_from)
        tail = after_from[:tail_end].strip()
        suffix = after_from[tail_end:]

        order_items = [keys]
        for item in select_list.split(","):
            # strip `AS alias` / trailing alias — not valid inside OVER()
            item = re.sub(r"\s+as\s+\w+\s*\Z", "", item.strip(), flags=re.IGNORECASE)
            if item and item != "*" and item.lower() not in (k.strip().lower() for k in keys.split(",")):
                order_items.append(item)
        order_by = ", ".join(order_items)

        counter += 1
        branch = (
            f"SELECT {select_list} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {keys} ORDER BY {order_by}) AS __don_rn "
            f"FROM {tail}) __don_{counter} WHERE __don_rn = 1 "
        )
        sql = sql[: m.start()] + branch + suffix


def translate(sql: str) -> str:
    """Full Postgres→Spark rewrite for one opaque SQL fragment."""
    out = sql.strip().rstrip(";")
    out = rewrite_casts(out)
    out = rewrite_distinct_on(out)
    return out
