"""Structured Streaming support: replay harness + streaming operators."""

from dp_dimension_importer_spark.streaming.changefeed import (
    changefeed_fold,
    make_changefeed_source,
    read_changes_stream,
)

__all__ = [
    "changefeed_fold",
    "make_changefeed_source",
    "read_changes_stream",
]
