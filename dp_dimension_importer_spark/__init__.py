"""dp_dimension_importer_spark — a PySpark-native analytics engine.

Built from scratch with the query and data-processing capabilities of the
reference ETL service (ONSdigital/dp-dimension-importer; see SURVEY.md for the
operator-by-operator blueprint with file:line citations), re-expressed
Spark-first:

* ``session``    — SparkSession factory with scale-aware defaults (AQE on,
                   UTC, Arrow on).
* ``catalog``    — registers the synthetic test tables as named temp views.
* ``operators``  — the declared analytics operator surface (SURVEY.md §2.3,
                   Q01–Q50) plus LLM-data-pipeline operators (dedup,
                   similarity search, text analysis, multimodal columns).
* ``pipeline``   — the reference's event-driven import pipeline (validate →
                   idempotent anti-join → graph node/edge derivation →
                   code-order broadcast join → patch-back → completion
                   events), as batch + Structured Streaming flows.
* ``streaming``  — replay harness + watermark/session-window/stateful-dedup
                   operators (SURVEY.md §2.3 Q46–Q50).
* ``registry``   — the single source of truth mapping query name →
                   (PySpark callable, DuckDB oracle SQL).
"""

from dp_dimension_importer_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]
__version__ = "0.1.0"
