"""Fuzzy (edit-distance) join — approximate string matching between two
frames, an operator Spark's relational layer lacks (a raw
``levenshtein(a,b) <= d`` predicate plans as a cartesian product).

Spark-first shape: LOSSLESS length-band blocking. Edit distance is
bounded below by length difference, so any pair within distance ``d``
has ``|len(a) - len(b)| <= d``; bucketing lengths at width ``d+1`` and
exploding the right side over its 2-3 reachable buckets turns the
cartesian product into one hash equi-join on the bucket key, with the
exact ``levenshtein`` filter applied only to in-band candidates —
identical results to the naive quadratic form at a fraction of the
pairs. At 100 TB both sides shuffle once on a small integer key; skew
only arises when one length band dominates, where salting composes.
The ``levenshtein`` evaluation itself is Spark's JVM built-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    a: DataFrame,
    b: DataFrame,
    col_a: str,
    col_b: str,
    max_dist: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``a`` and ``b`` whose strings are within edit
    distance ``max_dist``. Output carries every column of both frames
    plus ``dist``. ``how='inner'`` only (the blocking construction has
    no outer semantics). Null strings match nothing and drop out (their
    band key is null on the left, and explode of a null sequence drops
    the row on the right) — the sane reading of an undefined distance."""
    if how != "inner":
        raise ValueError("fuzzy_join supports how='inner' only")
    w = max_dist + 1
    la = a.withColumn("__band", F.floor(F.length(col_a) / w))
    # right side explodes to every band a within-distance partner could
    # occupy: floor((len-d)/w) .. floor((len+d)/w), 2-3 values
    lb = b.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor((F.length(col_b) - max_dist) / w),
                F.floor((F.length(col_b) + max_dist) / w),
            )
        ),
    )
    joined = la.join(lb, "__band").drop("__band")
    dist = F.levenshtein(F.col(col_a), F.col(col_b))
    return joined.filter(dist <= max_dist).withColumn("dist", dist)
