"""Entity-resolution join framework (SURVEY.md §2.3 'memoized
entity-resolution join' / §7 step 4).

~80 reference loaders resolve external ids per line with a positive
cache dict, a `notfnd` negative cache, and fallback keys
(`loaders/load-JensenLabPubMedScores.py:63-101`,
`loaders/load-KEGGDistances.py:123-167`, `python/TIN-X.py:136-143`).
Spark-first: each cache dict IS a broadcast join; the fallback chain is
a left-join cascade with coalesce; the negative cache is the anti-join
of still-unresolved rows, returned for the loader's 'notfnd' report
instead of being silently dropped.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Resolution:
    resolved: DataFrame      # input rows + resolved id column
    unresolved: DataFrame    # input rows that matched no key (notfnd)

    def counts(self) -> tuple[int, int]:
        """(resolved, notfnd) — the loaders' printed-count oracle."""
        return self.resolved.count(), self.unresolved.count()


def resolve(
    df: DataFrame,
    lookup: DataFrame,
    keys: list[tuple[str, str]],
    id_col: str = "protein_id",
    out_col: str = "protein_id",
) -> Resolution:
    """Resolve df rows to lookup ids through a fallback key chain.

    keys: [(df_col, lookup_col), ...] tried in order; the first match
    wins (`python/TIN-X.py:136-143` stringid → STRING xref → Ensembl
    xref chain). The lookup side is broadcast — it is the ~20k-protein
    dimension, never the fact stream.

    A df key may match MULTIPLE lookup rows (gid2pids in
    load-KEGGDistances maps one geneid to several proteins); like the
    reference, all matches are kept (fan-out join).
    """
    out = None
    remaining = df
    for i, (dcol, lcol) in enumerate(keys):
        lk = F.broadcast(
            lookup.select(
                F.col(lcol).alias(f"_k{i}"), F.col(id_col).alias(out_col)
            ).filter(F.col(lcol).isNotNull())
        )
        hit = remaining.join(lk, remaining[dcol] == lk[f"_k{i}"], "inner").drop(
            f"_k{i}"
        )
        out = hit if out is None else out.unionByName(hit)
        remaining = remaining.join(
            lk.select(f"_k{i}").distinct(),
            remaining[dcol] == F.col(f"_k{i}"),
            "left_anti",
        )
    return Resolution(resolved=out, unresolved=remaining)


def zero_fill(
    base: DataFrame,
    scores: DataFrame,
    key: str,
    score_col: str,
    default=0.0,
) -> DataFrame:
    """The post-load fixup pattern (`SQL/InsZeroJLPMSs_TCRDv7.sql:1-10`
    fills missing pmscores with 0) folded into the pipeline: left join
    + coalesce instead of a manual correction script."""
    return base.join(scores, key, "left").withColumn(
        score_col, F.coalesce(F.col(score_col), F.lit(default))
    )
