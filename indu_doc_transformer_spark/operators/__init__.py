"""Spark operators: extraction kernel wrapper, relational assembly,
dedup/similarity/text-analysis operators for training-data pipelines."""
