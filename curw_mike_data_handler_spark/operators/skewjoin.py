"""Skewed-key equi joins: the AQE runtime split and the explicit
salting fallback (SURVEY §2.3 J-family scale hardening).

The reference never joins at a scale where key skew matters (its
biggest join is a ~100-station dict lookup, e.g. the station-metadata
merge in ``outputs/extract_water_level.py``), but a 100 TB fact table
joined on a zipfian key concentrates one hash partition far above its
siblings — the single straggler task that stalls a 1000-executor
stage.  Two remedies, both expressed here so the engine demonstrates
them as first-class plans:

* **AQE skew split** (``skew=true`` on the join node): adaptive
  execution measures the map output at runtime and splits the
  oversized partition into sub-ranges, replicating the matching build
  side.  Zero query rewrite; needs
  ``spark.sql.adaptive.skewJoin.enabled`` (on by default) and a shuffle
  join to act on.  This is the default answer — declare the join,
  let the runtime re-plan.
* **Explicit salting** (``salted_equi_join``): when AQE can't help —
  a veto by a downstream partitioning requirement, an engine without
  AQE, or a key so hot one partition exceeds even the split budget —
  the fact side appends a deterministic salt in [0, n_salts) and the
  dim side replicates each row across all salts, so the hot key's rows
  spread over ``n_salts`` partitions by construction.  Cost: dim side
  ×n_salts (fine for dims far smaller than the fact), and the join key
  loses its clustering for downstream reuse.

Both produce bit-identical results to the plain equi join; only the
physical distribution differs — which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi join where the fact side's hot keys are spread over
    ``n_salts`` shuffle partitions.

    ``salt_source`` names a fact column whose hash seeds the salt
    (deterministic → reproducible plans and tests); default is the
    fact key's row-unique companion ``xxhash64`` of all columns.  The
    dim side is exploded ×``n_salts`` (one row per salt value) so every
    (key, salt) bucket finds its dim row.  Output columns = fact
    columns + dim columns minus the duplicate dim key.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    seed = F.col(salt_source) if salt_source else F.xxhash64(*fact.columns)
    # NULL seed → salt 0, NOT a NULL salt: pmod(NULL) is NULL and a
    # NULL salt never equals the dim side's, silently dropping the row
    # from an inner join the plain equi join would keep
    salt = F.coalesce(
        F.pmod(seed.cast("long"), F.lit(n_salts)), F.lit(0)
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    joined = f.join(d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]))
    keep = [f[c] for c in fact.columns]
    keep += [d[c] for c in dim.columns if c != dim_key]
    return joined.select(*keep)
