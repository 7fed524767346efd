"""PySpark-native analytics engine with the query / data-processing
capabilities of the reference warehouse project
(million-dollar-dev/nlu-data-warehouse_project).

The reference is a daily-batch ETL warehouse (scrape -> CSV -> staging
cleanse -> SCD2 merge, driven by a control-table state machine); every
relational op there is a SQL string executed by Postgres.  Here each of
those operations is re-expressed as an idiomatic PySpark operator
(DataFrame-in / DataFrame-out, Catalyst-optimizable), plus the
large-scale training-data operators (dedup families, similarity search,
text analysis, multimodal plumbing) the 100 TB north star asks for.

Layout
------
- ``session``    SparkSession factory tuned for local[N] testing but
                 configured like a cluster job (AQE, broadcast, Arrow).
- ``schemas``    StructTypes for every reference table (SURVEY.md §1.1).
- ``sources``    readers/writers: CSV feed, parquet lakehouse layers,
                 landing-path conventions (SURVEY.md §2.1 S1-S9).
- ``functions``  column-expression libraries: cleansing (C1-C7),
                 calendar derivations (D1-D14), text analysis.
- ``operators``  relational/dataflow operators: null repair (F1), keyed
                 dedup (F2), SCD2 merge (J2-J5), similarity search,
                 near-dup dedup families, multimodal plumbing.
- ``control``    control plane: file_config/file_logs tables, run-state
                 machine, idempotence guards (T2/T3).
- ``pipeline``   P1->P2->P3 composition over a run date (T1/T5).
- ``streaming``  Structured Streaming variants (incremental ingest,
                 windowed aggregation, stateful SCD2).
"""

__version__ = "0.1.0"
