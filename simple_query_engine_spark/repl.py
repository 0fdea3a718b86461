"""Interactive REPL — reference op #9 (reference ``src/main.rs:19-63``).

Load one CSV, then loop: read a query line, parse, execute, print.  Output
format matches the reference sink (``src/main.rs:46-51``): header line of
comma-joined projected names, a dashes separator sized to the header, then
one comma-joined line per row.  Parse/execution errors are printed and the
loop continues; ``exit`` / ``quit`` / ``q`` ends the session
(``src/main.rs:17,39``).

The load-once/query-many pattern maps to ``df.cache()`` — the Spark analogue
of the reference's eager index build amortized across REPL queries
(``src/table.rs:79-85``).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

from simple_query_engine_spark.executor import QueryExecutionError, execute
from simple_query_engine_spark.minilang.parser import QueryParseError, parse
from simple_query_engine_spark.session import get_spark
from simple_query_engine_spark.sources.readers import read_csv

EXIT_COMMANDS = frozenset({"exit", "quit", "q"})


def format_result(df: DataFrame, limit: int | None = None) -> str:
    """Render a result DataFrame in the reference's text format."""
    header = ",".join(df.columns)
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    lines = [header, "-" * len(header)]
    for row in rows:
        lines.append(",".join(_render(value) for value in row))
    return "\n".join(lines)


def _render(value) -> str:
    if value is None:
        return ""
    if isinstance(value, float) and value.is_integer():
        return str(int(value))
    return str(value)


def run(
    csv_path: str,
    input_stream=None,
    output_stream=None,
) -> None:
    """Run the REPL against one CSV file (reference CLI contract)."""
    input_stream = input_stream or sys.stdin
    output_stream = output_stream or sys.stdout
    spark = get_spark(app_name="simple-query-engine-repl")
    df = read_csv(spark, csv_path).cache()
    df.count()  # materialize the cache up front, like the reference's eager load
    print("Enter a query (PROJECT col, ... [FILTER col (>|=) value]):", file=output_stream)
    for line in input_stream:
        line = line.strip()
        if not line:
            continue
        if line in EXIT_COMMANDS:
            break
        try:
            query = parse(line)
            result = execute(query, df)
            print(format_result(result), file=output_stream)
        except (QueryParseError, QueryExecutionError) as error:
            print(f"Error: {error}", file=output_stream)
        except Exception as error:  # Catalyst analysis errors etc.
            print(f"Error: {error}", file=output_stream)


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: python -m simple_query_engine_spark.repl <csv-path>", file=sys.stderr)
        return 1
    run(argv[0])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
