"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce framework
(mohamed20o03/mapreduce-c-implementation), re-expressed Spark-first.

The reference (see SURVEY.md) is a single-process pthreads MapReduce over
untyped (string, string) pairs; its full operator surface — chunked scan,
flatMap, map-side combine, hash shuffle, per-partition sort, group-iterator
reduce, text sink — maps onto Spark's DataFrame engine with zero custom
execution code.  This package therefore consists of:

- ``session``   — SparkSession bootstrap tuned for the driver environment
- ``sources``   — table loaders over the driver-generated parquet fixtures
- ``registry``  — the operator registry: name -> (pyspark impl, oracle SQL)
- ``operators`` — every query/operator from SURVEY.md §2 plus the
                  capability categories the reference lacks (§2.2)
- ``functions`` — reusable column-expression helpers (tokenizer etc.)
- ``streaming`` — Structured Streaming variants of the event queries
- ``plans``     — plan-inspection helpers (pushdown/broadcast assertions)
"""

from mapreduce_c_implementation_spark.registry import (  # noqa: F401
    all_operators,
    get_operator,
    oracle_map,
    query_map,
)

__version__ = "0.1.0"
