"""Multi-select faceting — Solr's tagged-filter exclusion model.

Public knowledge of Solr's faceting contract
(u8:solr/core/src/java/org/apache/solr/search/facet/FacetProcessor.java,
SolrReturnFields tag/ex handling in
u8:solr/core/.../request/SimpleFacets.java ~1,100 LoC): filters are
*tagged* (``fq={!tag=L}lang:en``) and each facet can *exclude* tags
(``facet.field={!ex=L}lang``), so a multi-select UI shows, per dimension,
the counts the user WOULD get if that dimension's own filter were lifted
while every other filter stays applied.

Spark mapping: the scored match set joins the attribute table once; each
facet dimension is one partial+final groupBy over the base filtered by
every non-excluded predicate. The number of dimensions is an operator
constant, so the plan is a small fixed union of aggregations over one
shared scan — Catalyst caches the join across branches under AQE, and
nothing is data-proportional on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def multiselect_facets(base: DataFrame,
                       filters: dict[str, Column],
                       facets: dict[str, frozenset[str] | set[str]],
                       ) -> DataFrame:
    """Tagged-exclusion facet counts.

    ``base``    — the doc set to facet (already query-matched), carrying
                  the facet/filter attribute columns.
    ``filters`` — tag -> boolean Column (the tagged ``fq`` list).
    ``facets``  — facet field -> set of tags THAT FIELD excludes.

    Returns (facet_field, value, cnt): per facet field, the value counts
    over docs passing every filter whose tag is not excluded; values are
    stringified (Solr facet keys are strings), ordered cnt DESC then
    value ASC within each field, fields ASC.
    """
    outs = []
    for field in sorted(facets):
        excluded = facets[field]
        df = base
        for tag in sorted(filters):
            if tag not in excluded:
                df = df.filter(filters[tag])
        outs.append(df.groupBy(F.col(field).cast("string").alias("value"))
                    .agg(F.count("*").alias("cnt"))
                    .select(F.lit(field).alias("facet_field"),
                            "value", "cnt"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("facet_field", F.desc("cnt"), F.asc("value"))
