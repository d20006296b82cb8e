"""Operator surface (SURVEY.md §2.3 Q01–Q50 + LLM-data-pipeline operators).

Each module registers its queries into a module-local ``QUERIES`` /
``ORACLE`` pair via :func:`dp_dimension_importer_spark.operators.common.make_registry`;
``dp_dimension_importer_spark.registry`` merges them all.
"""
