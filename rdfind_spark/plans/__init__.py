"""Traversal-strategy facade — the counterpart of the reference's
``plan/`` package (``rdfind-algorithm/.../plan/TraversalStrategy.scala``
and subclasses), mapping each strategy id to its Spark implementation:

====  ==============================  =========================================
 id   reference class                 implementation here
====  ==============================  =========================================
 0    AllAtOnceTraversalStrategy      ``operators.cind.discover_cinds``
 1    SmallToLargeTraversalStrategy   ``operators.staged.discover_cinds_staged``
 2    ApproximateAllAtOnce...         ``discover_cinds(sketch_filter=True)``
 3    LateBBTraversalStrategy         subsumed by 2: LateBB only staggers WHEN
                                      ref-sets become Bloom bits to bound
                                      reducer memory — a concern the relational
                                      formulation does not have (no per-key
                                      ref arrays; Spark hash aggs spill)
====  ==============================  =========================================

All strategies return the identical exact CIND set (cross-checked by the
driver oracle and the property tests in ``tests/test_cind_engine.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rdfind_spark.operators.cind import discover_cinds
from rdfind_spark.operators.staged import discover_cinds_staged


def traversal(
    triples: DataFrame,
    strategy: int = 1,
    min_support: int = 10,
    minimal: bool = True,
    ar_filter: bool = False,
    projection: str | None = None,
) -> DataFrame:
    """Dispatch like the reference's ``--traversal-strategy`` switch
    (``programs/RDFind.scala:50-56,652-653``; default 1)."""
    if strategy in (0, 2):
        return discover_cinds(
            triples,
            min_support=min_support,
            minimal=minimal,
            ar_filter=ar_filter,
            projection=projection,
            sketch_filter=strategy == 2,
        )
    if strategy in (1, 3):
        return discover_cinds_staged(
            triples,
            min_support=min_support,
            ar_filter=ar_filter,
            projection=projection,
        )
    raise ValueError(f"unknown traversal strategy {strategy}")
