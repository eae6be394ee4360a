"""company_name_matching_spark — a PySpark-native record-linkage engine.

Blocking → pairwise scoring → transitive clustering over web-page tables,
with Vietnamese-aware company-name normalization, built Spark-first
(DataFrame/Catalyst + Arrow-batched pandas UDFs; no per-row Python, no
driver-side index).

Matching semantics re-derived from the public reference repo
``dangphdh/company_name-matching`` (see SURVEY.md); architecture is original.
"""

__version__ = "0.1.0"
