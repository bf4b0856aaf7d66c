"""Flink group-window SQL syntax accepted verbatim.

Flink 1.10 batch/stream SQL expresses windowed aggregation as group
window functions in GROUP BY with auxiliary start/end selectors
(``flink-table-planner-blink/.../functions/sql/FlinkSqlOperatorTable.java``
— ``TUMBLE``/``HOP``/``SESSION`` and ``TUMBLE_START``/``TUMBLE_END``/
``HOP_START``/``HOP_END``/``SESSION_START``/``SESSION_END``; planner
rule ``LogicalWindowAggregateRuleBase``):

    SELECT user_id, TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id, TUMBLE(ts, INTERVAL '1' HOUR)

Spark expresses the same plan with the ``window()`` /
``session_window()`` table functions grouped by the window struct.
:func:`rewrite_group_windows` rewrites the Flink form into the Spark
form textually so `TableEnvironment.sql_query` accepts migrated Flink
SQL unchanged:

- ``TUMBLE(ts, INTERVAL 'n' U)``           -> ``window(ts, 'n u')``
- ``HOP(ts, INTERVAL 's' U, INTERVAL 'z' U)`` -> ``window(ts, 'z u', 's u')``
  (Flink orders (slide, size); Spark orders (size, slide))
- ``SESSION(ts, INTERVAL 'g' U)``          -> ``session_window(ts, 'g u')``
- ``X_START(args)`` / ``X_END(args)``      -> ``<rewritten window>.start/.end``

The rewrite is purely syntactic: the result is planned by Catalyst like
any native windowed aggregation (pushdown, partial aggs, AQE all apply).
"""

from __future__ import annotations

import re

_UNITS = {"SECOND": "seconds", "MINUTE": "minutes", "HOUR": "hours",
          "DAY": "days"}

_INTERVAL = r"INTERVAL\s+'([\d.]+)'\s+(SECOND|MINUTE|HOUR|DAY)"


def _iv(num: str, unit: str) -> str:
    return f"'{num} {_UNITS[unit.upper()]}'"


def rewrite_group_windows(sql: str) -> str:
    """Rewrite Flink group-window functions/selectors to Spark syntax."""
    out = sql

    # selectors first (TUMBLE_START(...) contains TUMBLE(...) textually)
    sel_re = re.compile(
        r"\b(TUMBLE|HOP|SESSION)_(START|END)\s*\(\s*([\w.]+)\s*,\s*"
        + _INTERVAL + r"(\s*,\s*" + _INTERVAL + r")?\s*\)",
        re.IGNORECASE)

    def sel_repl(m: re.Match) -> str:
        kind = m.group(1).upper()
        bound = m.group(2).lower()
        col = m.group(3)
        if m.group(6):  # second interval present (HOP)
            inner = _hop(col, m.group(4), m.group(5), m.group(7), m.group(8))
        else:
            inner = _single(kind, col, m.group(4), m.group(5))
        return f"{inner}.{bound}"

    out = sel_re.sub(sel_repl, out)

    # bare group-window calls
    win_re = re.compile(
        r"\b(TUMBLE|HOP|SESSION)\s*\(\s*([\w.]+)\s*,\s*" + _INTERVAL
        + r"(\s*,\s*" + _INTERVAL + r")?\s*\)",
        re.IGNORECASE)

    def win_repl(m: re.Match) -> str:
        kind = m.group(1).upper()
        col = m.group(2)
        if m.group(5):  # HOP(ts, slide, size)
            return _hop(col, m.group(3), m.group(4), m.group(6), m.group(7))
        return _single(kind, col, m.group(3), m.group(4))

    out = win_re.sub(win_repl, out)
    return out


def _single(kind: str, col: str, num: str, unit: str) -> str:
    if kind == "SESSION":
        return f"session_window({col}, {_iv(num, unit)})"
    return f"window({col}, {_iv(num, unit)})"


def _hop(col: str, slide_n: str, slide_u: str, size_n: str, size_u: str) -> str:
    # Flink: HOP(ts, slide, size); Spark: window(ts, size, slide)
    return f"window({col}, {_iv(size_n, size_u)}, {_iv(slide_n, slide_u)})"
