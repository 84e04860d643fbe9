"""PySpark-native document-structure extraction engine.

A from-scratch re-expression of the extraction semantics of
EPDF-Extractor/indu-doc-transformer (reference at /root/reference) as a
main-content extraction job over Common-Crawl-style web-page tables:

- input table  (url, warc_ts, html binary, text, lang)
- vectorized Arrow/pandas kernels tokenize markup, build a layout-block
  tree, classify pages, score boilerplate, and segment region tables
- a relational assembly layer (pure DataFrame ops) turns normalized rows
  into deduplicated entity tables (xtargets / aspects / connections /
  links / pins / attributes) with content-hash GUIDs
- per-partition lineage + metrics, checkpoint/resume, skew salting

Architecture is Spark-first (DataFrame/Catalyst); the reference tells us
WHAT to compute, not HOW.
"""

__version__ = "0.1.0"
