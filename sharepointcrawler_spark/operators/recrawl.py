"""Recrawl (refresh) scheduling over a fetch-history table.

The reference crawls once and stops (SharePointClient.cs drains its
queue); a production web crawler at 10^10 URLs spends most of its
budget RE-fetching, and deciding *what* to refresh is the scheduling
problem: Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
Crawlers" (2003) — model each page's change process as Poisson with
rate λ, estimate λ from the observed (visits, detected changes)
history, and prioritize pages by how likely they changed since their
last fetch.

Spark-first shape: every column below is a pure built-in expression
over one scan of the history table — no UDFs, no shuffles; the only
exchange in the whole feature is the optional per-host top-k window
(same skew-aware pattern as operators/politeness.py). At 100 TB the
history table is the frontier's metrics sidecar, partitioned by host.

Numeric notes: λ and the age/priority products use only IEEE-exact
operations (+ - * /), so an external oracle recomputes them
bit-identically; ``p_changed``/``next_due`` involve exp/ln, whose libm
implementations may differ by 1 ulp across engines — they are part of
the API (pytest-verified against python's math) but deliberately NOT
part of the hash-compared oracle surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ln(2): the λ·age product at which p_changed = 1 - exp(-λ·age) crosses
# 1/2 — the "more likely changed than not" refresh threshold, as a
# literal so the due test is an IEEE-exact multiply + compare.
LN2 = 0.6931471805599453

SECONDS_PER_DAY = 86400.0


def recrawl_priorities(
    history: DataFrame,
    now_s: int,
    id_col: str = "url_canon",
    first_fetch_col: str = "first_fetch_s",
    last_fetch_col: str = "last_fetch_s",
    n_fetches_col: str = "n_fetches",
    n_changes_col: str = "n_changes",
    importance_col: str | None = None,
) -> DataFrame:
    """History -> per-URL refresh features (one projection, no shuffle):

    * ``lambda_per_day`` — smoothed Poisson change-rate MLE,
      ``(n_changes + 0.5) / (observed_days + 1)`` (the +0.5/+1 prior
      keeps never-changed pages at a small nonzero rate instead of
      freezing them out forever; observed window = first..last fetch).
    * ``age_days`` — days since the last fetch at ``now_s``.
    * ``staleness`` — λ · age · importance, the expected number of
      missed changes scaled by page importance (importance defaults
      to 1). Monotone in p_changed, IEEE-exact, and the ORDERING is
      identical to ordering by p_changed·importance for equal
      importance — the ranking column.
    * ``due`` — λ · age >= ln 2, i.e. the page more likely changed
      than not since its last fetch.
    * ``p_changed`` — 1 - exp(-λ·age), the calibrated probability
      (API column; excluded from exact-oracle comparison, see module
      docstring).

    Timestamps are epoch SECONDS (bigint) — timezone-free arithmetic.
    """
    first = F.col(first_fetch_col).cast("double")
    last = F.col(last_fetch_col).cast("double")
    # clamp malformed histories (last < first would make the +1-day
    # smoothing denominator zero or negative; a future last_fetch would
    # make age negative): both clamp to the well-defined boundary
    observed_days = F.greatest(
        (last - first) / F.lit(SECONDS_PER_DAY), F.lit(0.0)
    )
    lam = (F.col(n_changes_col).cast("double") + F.lit(0.5)) / (
        observed_days + F.lit(1.0)
    )
    age = F.greatest(
        (F.lit(float(now_s)) - last) / F.lit(SECONDS_PER_DAY), F.lit(0.0)
    )
    imp = (
        F.col(importance_col).cast("double")
        if importance_col is not None
        else F.lit(1.0)
    )
    lam_age = lam * age
    return history.select(
        F.col(id_col),
        lam.alias("lambda_per_day"),
        age.alias("age_days"),
        (lam_age * imp).alias("staleness"),
        (lam_age >= F.lit(LN2)).alias("due"),
        (F.lit(1.0) - F.exp(-lam_age)).alias("p_changed"),
    )


def select_refresh_batch(
    priorities: DataFrame,
    per_host: int,
    host_col: str = "host",
    id_col: str = "url_canon",
) -> DataFrame:
    """Top-``per_host`` DUE urls per host by staleness — the refresh
    batch a polite crawler hands to the fetch scheduler. One window on
    the host key (the same partitioning the politeness operator
    shuffles on, so the exchanges line up back-to-back); ties break by
    id for determinism."""
    w = Window.partitionBy(host_col).orderBy(
        F.desc("staleness"), F.col(id_col)
    )
    return (
        priorities.filter(F.col("due"))
        .withColumn("refresh_rank", F.row_number().over(w))
        .filter(F.col("refresh_rank") <= per_host)
    )


def apply_refresh_outcome(
    history: DataFrame,
    outcomes: DataFrame,
    now_s: int,
    id_col: str = "url_canon",
    changed_col: str = "changed",
) -> DataFrame:
    """Fold one refresh round's fetch outcomes back into the history
    table: for each refreshed URL ``last_fetch_s`` moves to ``now_s``,
    ``n_fetches`` bumps, and ``n_changes`` bumps when the fetch observed
    a change (content hash differed). Untouched URLs pass through
    unchanged — the history is an upsert target, exactly the frontier's
    merge-on-read shape, so at scale this is one broadcast (or bucketed)
    left join over the history scan, no shuffle of the big side beyond
    the join itself.

    ``outcomes``: (id_col, changed bool). Rows in ``outcomes`` missing
    from ``history`` are ignored (a refresh can only touch known URLs).
    """
    o = outcomes.select(
        F.col(id_col),
        F.col(changed_col).cast("boolean").alias("_refreshed_changed"),
    ).withColumn("_refreshed", F.lit(True))
    joined = history.join(o, id_col, "left")
    hit = F.col("_refreshed").isNotNull()
    return (
        joined.withColumn(
            "last_fetch_s",
            F.when(hit, F.lit(int(now_s)).cast("long")).otherwise(
                F.col("last_fetch_s").cast("long")
            ),
        )
        .withColumn(
            "n_fetches",
            F.when(hit, F.col("n_fetches") + F.lit(1)).otherwise(
                F.col("n_fetches")
            ),
        )
        .withColumn(
            "n_changes",
            F.when(
                hit & F.coalesce(F.col("_refreshed_changed"), F.lit(False)),
                F.col("n_changes") + F.lit(1),
            ).otherwise(F.col("n_changes")),
        )
        .drop("_refreshed", "_refreshed_changed")
    )
