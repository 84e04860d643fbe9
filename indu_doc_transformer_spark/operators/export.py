"""Structured exports: AML-style XML per instance hierarchy + JSON
stats dump.

Re-expresses the reference's exporters
(/root/reference/src/indu_doc/exporters/aml_builder/aml_builder.py:248-400
build_tree + serialize; cli.py:73-92 JSON export) Spark-first:

- the instance hierarchy is grouped relationally (aspect path prefix ->
  collect_list), and each group's subtree is serialized inside one
  ``mapInPandas`` partition pass (driver never materializes entities);
- XML is built with plain string assembly (deterministic, no lxml
  dependency), one document per hierarchy root;
- stats = one groupBy().count() per entity table (manager.py:350-382).
"""

from __future__ import annotations

from typing import Iterator
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_ASPECTS, AspectsConfig

XML_SCHEMA = "root string, n_targets int, xml string"


def _path_levels(config: AspectsConfig):
    """tag -> array of 'sep+value' path components in priority order,
    from the xtargets table's parts (computed relationally upstream)."""
    # parts are re-derived from the tag string with the same pandas UDF
    # used by the assembly layer
    from ..functions.tags import make_tag_parts_udf

    return make_tag_parts_udf(config)


def aml_export(xtargets: DataFrame, config: AspectsConfig = DEFAULT_ASPECTS) -> DataFrame:
    """One XML document per top-level aspect (hierarchy root), built
    from the grouped target list (aml_builder.py:248-300 build_tree).

    Returns (root, n_targets, xml)."""
    parts_udf = _path_levels(config)
    seps = config.separators

    path_expr = F.array_compact(
        F.transform(
            F.map_entries(parts_udf(F.col("tag"))),
            lambda e: F.when(
                F.size(e["value"]) > 0,
                F.concat(e["key"], F.element_at(e["value"], 1)),
            ),
        )
    )
    with_path = xtargets.withColumn("path", path_expr).where(F.size("path") > 0)
    grouped = with_path.groupBy(F.element_at("path", 1).alias("root")).agg(
        F.sort_array(
            F.collect_list(F.struct("path", "tag", "guid", "target_type"))
        ).alias("targets")
    )

    def serialize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            roots, counts, xmls = [], [], []
            for root, targets in zip(pdf["root"], pdf["targets"]):
                lines = [f'<InstanceHierarchy Name="{escape(str(root))}">']
                stack: list[str] = []
                for t in targets:
                    path = list(t["path"])
                    # close levels that diverge
                    while stack and stack != path[: len(stack)]:
                        lines.append("</InternalElement>")
                        stack.pop()
                    for comp in path[len(stack):]:
                        lines.append(f'<InternalElement Name="{escape(comp)}">')
                        stack.append(comp)
                    lines.append(
                        f'<XTarget Tag="{escape(t["tag"])}" Guid="{t["guid"]}" '
                        f'Type="{t["target_type"]}"/>'
                    )
                while stack:
                    lines.append("</InternalElement>")
                    stack.pop()
                lines.append("</InstanceHierarchy>")
                roots.append(root)
                counts.append(len(targets))
                xmls.append("\n".join(lines))
            yield pd.DataFrame({"root": roots, "n_targets": counts, "xml": xmls})

    return grouped.mapInPandas(serialize, schema=XML_SCHEMA)


def aspect_tree(
    xtargets: DataFrame, config: AspectsConfig = DEFAULT_ASPECTS, depth: int = 3
) -> DataFrame:
    """Prefix tree by aspect levels (A14, manager.py:317-345 get_tree):
    grouping over the first `depth` hierarchy levels with the tag set
    collected at each leaf — the manual-rollup-as-groupBy recast."""
    parts_udf = _path_levels(config)
    seps = config.separators[:depth]
    df = xtargets.withColumn("parts", parts_udf(F.col("tag")))
    levels = [
        F.concat(
            F.lit(sep),
            F.coalesce(
                F.try_element_at(
                    F.try_element_at("parts", F.lit(sep)), F.lit(1)
                ),
                F.lit(""),
            ),
        ).alias(f"level{i}")
        for i, sep in enumerate(seps, 1)
    ]
    level_names = [f"level{i}" for i in range(1, len(seps) + 1)]
    return (
        df.select(*levels, "tag")
        .groupBy(*level_names)
        .agg(F.sort_array(F.collect_set("tag")).alias("tags"), F.count("*").alias("n"))
    )


def stats(tables: dict[str, DataFrame]) -> DataFrame:
    """Entity counts (manager.py:350-382): (table, n)."""
    spark = next(iter(tables.values())).sparkSession
    parts = [
        df.groupBy().count().select(F.lit(name).alias("table"), F.col("count").alias("n"))
        for name, df in tables.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def json_export(tables: dict[str, DataFrame], path: str) -> None:
    """df.write.json per entity table (cli.py:73-92 analog)."""
    for name, df in tables.items():
        df.write.mode("overwrite").json(f"{path}/{name}")
