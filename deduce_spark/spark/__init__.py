"""Spark-side operators: pandas-UDF annotate stages, KG materialization,
dedup / similarity / text-analysis operators, lineage + resume plumbing."""
