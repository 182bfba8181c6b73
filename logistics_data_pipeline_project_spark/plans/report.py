"""Report / e-mail sinks (SURVEY §K7/K8).

The reference renders pandas HTML tables (top-5 stores, refund rates,
exec-summary aggregates) and ships them via SES
(dags/snowflake/email_utils.py:21-127;
dags/4_logistics_ticket_classifier_full_dag.py:88-150). The data work is
presentation-scale (top-k of an aggregate) → `limit()` + `toPandas()` is
correct here; the send itself is orchestration, stubbed behind a callable
so tests can capture it.
"""

from __future__ import annotations

import html
from collections.abc import Callable

from pyspark.sql import DataFrame


def df_to_html_table(df: DataFrame, max_rows: int = 10, title: str | None = None) -> str:
    """Render a (small) DataFrame as an HTML table — K7's
    fetch_pandas_all + to_csv/to_html, bounded by LIMIT."""
    pdf = df.limit(max_rows).toPandas()
    rows = ["<table border='1'>"]
    if title:
        rows.insert(0, f"<h3>{html.escape(title)}</h3>")
    rows.append(
        "<tr>" + "".join(f"<th>{html.escape(str(c))}</th>" for c in pdf.columns) + "</tr>"
    )
    for _, r in pdf.iterrows():
        rows.append(
            "<tr>" + "".join(f"<td>{html.escape(str(v))}</td>" for v in r) + "</tr>"
        )
    rows.append("</table>")
    return "\n".join(rows)


def exec_summary_report(
    sections: dict[str, DataFrame],
    send: Callable[[str, str], None] | None = None,
    subject: str = "Pipeline report",
    max_rows: int = 10,
) -> str:
    """Compose the K8 exec-summary e-mail body from named DataFrames and
    hand it to ``send(subject, body)`` (SES in the reference; injectable —
    default is a no-op so the engine has no cloud dependency)."""
    body = "\n".join(
        df_to_html_table(df, max_rows=max_rows, title=name)
        for name, df in sections.items()
    )
    if send is not None:
        send(subject, body)
    return body
