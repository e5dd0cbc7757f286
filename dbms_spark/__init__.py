"""dbms_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wentaojin/dbms (reference read-only at
/root/reference), re-expressed Spark-first.

The reference is a Go database-migration platform; its "queries" are
deterministic dataflows (chunked scans, checksum compares, multiset
diffs, CDC apply, profiling aggregations).  Here every one of those is
a declarative DataFrame/SQL plan that Catalyst optimizes, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.

Layout
------
- ``session``            SparkSession factory tuned for local + cluster
- ``sources.catalog``    parquet-backed table catalog (test corpus)
- ``sources.jdbc``       partition-predicate JDBC reader planning
- ``functions.canonical``canonical row string + MD5 slice-sum checksums
                         (dual-emitted as Spark Columns AND DuckDB SQL)
- ``plans.chunker``      statistics-driven chunk/range planner
- ``operators.compare``  multiset diff / chunked checksum / column seek
- ``operators.migrate``  partitioned read → batch sinks (+ safe mode)
- ``operators.scan``     sampled column profiling (NUMBER classification)
- ``operators.assess``   assessment aggregation pack
- ``operators.structm``  datatype-mapping ladder + struct compare
- ``streaming.cdc``      CDC consume: watermark, dedup, DDL barrier
- ``llm``                dedup / similarity / text-analysis / multimodal
"""

__version__ = "0.1.0"

from dbms_spark.session import get_spark  # noqa: F401
