"""Metric-bundle serving layer (SURVEY §3.2; reference ``app/metrics.py``
+ ``app/main.py`` endpoints, ``app/app.py`` dashboard queries).

One function per reference endpoint, computed over a :class:`etl.Warehouse`
(or any dict of the 9 schema tables).  Where the reference issues ~8
sequential ORM queries per endpoint, each hitting Postgres, the bundles
here collapse into a handful of multi-aggregate DataFrame jobs:

- split counts are one pass with ``sum(when(...))`` (A6) instead of two
  filtered ``COUNT(*)`` round-trips (``app/metrics.py:77-78``);
- percent-of-total is a window over the grouped frame (A10) instead of a
  Python post-pass (``app/metrics.py:58-60``);
- the dynamic filter dict becomes composed ``Column`` predicates (P3) —
  no f-string SQL splicing (the injection bug class of
  ``app/app.py:99-108`` is designed out).

Scale: every bundle filters the fact by politician FIRST (pushdown to the
scan), joins broadcast dims, and aggregates into tiny frames — the same
access pattern the reference hand-tunes with indexes
(``sql/creations.sql:174-176``); here partition/bucket layout on
``politician_id`` plays that role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _filtered_donations(donations: DataFrame, filters: dict | None) -> DataFrame:
    """P3: dynamic predicate builder over the donations fact
    (app/app.py:94-117) — composed Columns, default everything."""
    pred = F.lit(True)
    f = filters or {}
    if "politician_id" in f:
        pred = pred & (F.col("politician_id") == f["politician_id"])
    if "min_amount" in f:
        pred = pred & (F.col("amount") >= f["min_amount"])
    if "max_amount" in f:
        pred = pred & (F.col("amount") <= f["max_amount"])
    if "since" in f:
        pred = pred & (F.col("date") >= f["since"])
    return donations.filter(pred)


def financial_metrics(
    donations: DataFrame, donors: DataFrame, filters: dict | None = None
) -> dict[str, DataFrame]:
    """The reference's most-traveled path (app/metrics.py:49-67,
    app/app.py:120-195): scalar total, by-type breakdown with pct-of-total,
    top-10 donors, monthly timeline — 4 small frames over one filtered
    fact."""
    base = _filtered_donations(donations, filters).join(
        F.broadcast(donors.select("donor_id", "name", "donor_type")), "donor_id"
    )
    total = base.agg(
        F.coalesce(F.sum("amount"), F.lit(0).cast("decimal(12,2)")).alias("total_donations"),
        F.count("*").alias("n_donations"),
        F.countDistinct("donor_id").alias("n_donors"),
    )
    by_type = base.groupBy(
        F.coalesce("donor_type", F.lit("Unknown")).alias("donor_type")
    ).agg(F.sum("amount").alias("total"), F.count("*").alias("n"))
    by_type = by_type.withColumn(
        "pct",
        (F.col("total") * 100 / F.sum("total").over(Window.partitionBy())).cast("decimal(5,2)"),
    ).orderBy(F.desc("total"))
    top_donors = (
        base.groupBy("name", "donor_type")
        .agg(F.sum("amount").alias("total_donated"))
        .orderBy(F.desc("total_donated"), F.asc("name"))
        .limit(10)
    )
    timeline = (
        base.groupBy(
            F.date_format(F.date_trunc("month", "date"), "yyyy-MM").alias("month"), "donor_type"
        )
        .agg(F.sum("amount").alias("total"))
        .orderBy("month", "donor_type")
    )
    return {"total": total, "by_type": by_type, "top_donors": top_donors, "timeline": timeline}


def legislative_metrics(
    bills: DataFrame, cosponsors: DataFrame, politician_id: int
) -> dict[str, DataFrame]:
    """app/metrics.py:70-78: sponsored count, cosponsored split
    original/later (ONE pass via conditional agg), recent sponsored
    bills."""
    sponsored = bills.filter(F.col("sponsor_id") == politician_id)
    n_sponsored = sponsored.agg(F.count("*").alias("n_sponsored"))
    cos = cosponsors.filter(F.col("politician_id") == politician_id).agg(
        F.count("*").alias("n_cosponsored"),
        F.sum(F.when(F.col("is_original_cosponsor"), 1).otherwise(0)).alias("n_original"),
        F.sum(F.when(~F.col("is_original_cosponsor"), 1).otherwise(0)).alias("n_joined_later"),
    )
    recent = (
        sponsored.select("official_bill_number", "congress", "title", "date_introduced")
        .orderBy(F.desc("date_introduced"), "official_bill_number")
        .limit(10)
    )
    return {"sponsored": n_sponsored, "cosponsored": cos, "recent_bills": recent}


def voting_metrics(
    votes: DataFrame, bills: DataFrame, politician_id: int
) -> dict[str, DataFrame]:
    """app/metrics.py:81-93: position breakdown + recent votes enriched
    with bill info (J2 broadcast)."""
    mine = votes.filter(F.col("politician_id") == politician_id)
    breakdown = (
        mine.groupBy(F.coalesce("vote_position", F.lit("Unknown")).alias("vote_position"))
        .agg(F.count("*").alias("n"))
        .orderBy("vote_position")
    )
    recent = (
        mine.join(
            F.broadcast(bills.select("bill_id", "official_bill_number", "title")), "bill_id"
        )
        .select("date", "vote_position", "official_bill_number", "title")
        .orderBy(F.desc("date"), "official_bill_number")
        .limit(20)
    )
    return {"breakdown": breakdown, "recent_votes": recent}


def committee_metrics(
    assignments: DataFrame, committees: DataFrame, politicians: DataFrame, committee_id: str
) -> dict[str, DataFrame]:
    """app/metrics.py:520-683: committee info + member roster ranked
    majority-first (W2 as a window; the reference sorts in Python,
    app/metrics.py:635)."""
    info = committees.filter(F.col("committee_id") == committee_id)
    w = Window.partitionBy().orderBy(
        (F.col("party") != "majority").cast("int"), F.asc_nulls_last("rank")
    )
    roster = (
        assignments.filter(F.col("committee_id") == committee_id)
        .join(
            F.broadcast(
                politicians.select(
                    "politician_id",
                    F.concat_ws(" ", "first_name", "last_name").alias("member_name"),
                )
            ),
            "politician_id",
        )
        .withColumn("order_in_roster", F.row_number().over(w))
        .select("order_in_roster", "member_name", "role", "party", "rank")
    )
    n_members = assignments.filter(F.col("committee_id") == committee_id).agg(
        F.countDistinct("politician_id").alias("n_members")
    )
    return {"info": info, "roster": roster, "n_members": n_members}


def dashboard_stats(tables: dict[str, DataFrame]) -> DataFrame:
    """app/main.py:144-168: the 8-count stats panel as ONE unioned job
    instead of 8 sequential COUNT queries (A11)."""
    pols = tables["politicians"]
    counts = [
        pols.agg(F.lit("politicians_total").alias("stat"), F.count("*").alias("value")),
        pols.filter("is_active").agg(
            F.lit("politicians_active").alias("stat"), F.count("*").alias("value")
        ),
        pols.filter(F.col("chamber") == "House").agg(
            F.lit("politicians_house").alias("stat"), F.count("*").alias("value")
        ),
        pols.filter(F.col("chamber") == "Senate").agg(
            F.lit("politicians_senate").alias("stat"), F.count("*").alias("value")
        ),
    ]
    for t in ("donors", "donations", "bills", "votes"):
        counts.append(
            tables[t].agg(F.lit(f"{t}_total").alias("stat"), F.count("*").alias("value"))
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.orderBy("stat")


def paginate_politicians(
    politicians: DataFrame,
    filters: dict | None = None,
    skip: int = 0,
    limit: int = 100,
) -> tuple[DataFrame, int]:
    """app/main.py:51-111: filtered list endpoint with offset/limit +
    total count.  Deterministic: total-ordered by the unique key before
    the window (SURVEY §7 hard-part 4)."""
    pred = F.lit(True)
    f = filters or {}
    for key in ("party", "state", "chamber"):
        if key in f:
            pred = pred & (F.col(key) == f[key])
    if f.get("active_only"):
        pred = pred & F.col("is_active")
    base = politicians.filter(pred)
    total = base.count()
    w = Window.orderBy("last_name", "first_name", "congress_id")
    page = (
        base.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > skip) & (F.col("_rn") <= skip + limit))
        .drop("_rn")
    )
    return page, total
