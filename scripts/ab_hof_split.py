"""A/B: does split(text) inside a HOF lambda re-evaluate per element?

Times the current shingle expression (split re-referenced inside the
transform lambda) against a let-bound form (split bound once per row
via the 1-element-array transform trick from operators/hocr.py), on
the sf documents table with a noop sink, interleaved reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hocr_de_noising_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("ab-hof-split", cores=CPUS, shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # page-cache warm

    n = 3
    cur = F.expr(
        f"transform(sequence(1, size(split(text,' ')) - {n - 1}),"
        f" i -> concat_ws(' ', slice(split(text,' '), i, {n})))"
    )
    let = F.expr(
        f"element_at(transform(array(split(text,' ')),"
        f" t -> transform(sequence(1, size(t) - {n - 1}),"
        f" i -> concat_ws(' ', slice(t, i, {n})))), 1)"
    )
    base = docs.filter(
        F.col("text").isNotNull() & (F.size(F.split("text", " ")) >= n)
    )
    a = base.select("doc_id", F.explode(F.array_distinct(cur)).alias("s"))
    b = base.select("doc_id", F.explode(F.array_distinct(let)).alias("s"))

    # identical output check
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    noop(a)
    noop(b)  # warm codegen

    t = {"cur": [], "let": []}
    for _ in range(4):
        t0 = time.time(); noop(a); t["cur"].append(round(time.time() - t0, 3))
        t0 = time.time(); noop(b); t["let"].append(round(time.time() - t0, 3))
    print(t)
    spark.stop()


if __name__ == "__main__":
    main()
