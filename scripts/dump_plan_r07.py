"""Dump .explain('formatted') for a named query expression to plans/r07/.

Usage: python scripts/dump_plan_r07.py <outfile> <snippet>
where <snippet> is a python expression evaluated with (spark, F, entry)
in scope that returns a DataFrame."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from buildlog_consultant_spark.spark import get_spark
from pyspark.sql import functions as F  # noqa


def formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main():
    out, snippet = sys.argv[1], sys.argv[2]
    spark = get_spark("local[8]", app_name="plans-r07")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry  # noqa
    df = eval(snippet)
    Path(out).write_text(formatted(spark, df))
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
