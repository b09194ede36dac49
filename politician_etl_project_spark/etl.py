"""End-to-end ETL orchestration (SURVEY §3.4; reference
``scripts/run_all_updates.py:14-19`` — bills → sponsors/cosponsors →
votes → donations in FK-dependency order, each step upserting with
conflict handling and appending to ``update_log``).

The reference runs four pandas scripts sequentially against Postgres.
Here the whole flow is a DAG of DataFrame jobs over a parquet
:class:`Warehouse`, with the reference's three conflict policies
(update-wins / first-wins / append) supplied by
``operators.upsert.merge_keep`` and surrogate keys assigned
deterministically (row_number over natural keys — SURVEY §7 hard-parts
1-2).

Fact tables carry their natural keys (congress_id, bill_key,
fec_filing_id) alongside the surrogate ints, so id resolution is a
re-runnable broadcast join, never a stateful counter — that is what makes
the pipeline idempotent: replaying the same staging input yields a
byte-identical warehouse (tested in tests/test_etl.py).

Scale: each step is one or two shuffles (the upsert's key dedup).  Dims
(politicians, committees) broadcast in every resolution join; only
donations/votes shuffle at fact scale.  At 100 TB the warehouse tables
would be partitioned by congress / date and the upsert rewrite becomes a
partition-scoped MERGE, same plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.operators.upsert import (
    ParquetUpsertTable,
    dedup_keys,
    log_update,
    merge_keep,
    stable_ids,
)
from politician_etl_project_spark.sources import bills_xml, committees_yaml, fec, members, votes_json


class Warehouse:
    """The reference's 8-table star schema as managed parquet upsert
    tables (sql/creations.sql; app/models.py:11-148), plus update_log."""

    KEYS = {
        "politicians": ["congress_id"],                       # UNIQUE, models.py:14
        "donors": ["donor_source_key"],                       # UNIQUE, models.py:38
        "donations": ["fec_filing_id"],                       # natural filing id
        "bills": ["official_bill_number", "congress"],        # composite UNIQUE, models.py:82
        "bill_cosponsors": ["bill_id", "politician_id"],      # UNIQUE, models.py:97
        # the reference has NO unique constraint on votes (autoincrement
        # PK, models.py:105) and the House holds several roll calls on
        # one bill in one day — keying on (politician, bill, date) would
        # silently collapse an amendment vote into final passage.
        # roll_key (per-roll-call source identity) keeps them distinct;
        # a voter appears once per roll call, so this IS the natural key
        "votes": ["politician_id", "roll_key"],
        "committees": ["committee_id"],                       # PK, models.py:119
        "committee_assignments": ["politician_id", "committee_id", "congress"],  # models.py:147
        "update_log": ["log_id"],
    }

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.tables = {
            name: ParquetUpsertTable(spark, os.path.join(root, name), keys)
            for name, keys in self.KEYS.items()
        }

    def __getitem__(self, name: str) -> ParquetUpsertTable:
        return self.tables[name]

    def read(self, name: str) -> DataFrame:
        return self.tables[name].read()

    # hot key per fact table: the column every serving-layer bundle
    # filters/groups/joins on (metrics.py); bucketing on it makes those
    # plans Exchange-free — the scale analog of the reference's
    # politician_id/bill_id indexes (sql/creations.sql:174-176)
    BUCKET_KEYS = {
        "donations": ["politician_id"],
        "votes": ["politician_id"],
        "bill_cosponsors": ["politician_id"],
    }

    def bucketize(self, name: str, n_buckets: int = 8) -> str:
        """Materialize a warehouse table as a bucketed managed table
        (``wh_<name>``) clustered on its hot key.  Serving queries that
        group by or join on that key then plan with zero Exchange on the
        fact side (assert-tested in tests/test_storage.py); at 100 TB
        this is the difference between re-shuffling 4.6M donations per
        dashboard refresh and reading co-located buckets."""
        from politician_etl_project_spark.storage import write_bucketed

        keys = self.BUCKET_KEYS[name]
        table = f"wh_{name}"
        write_bucketed(self.read(name), table, keys, n_buckets=n_buckets, sort_cols=keys)
        return table

    def log(self, table_name: str, n: int, notes: str | None = None) -> None:
        log_update(self.spark, None, table_name, n, notes=notes).write.mode("append").parquet(
            self.tables["update_log"].path
        )


def _dense_ids(df: DataFrame, order_cols: list[str], id_col: str) -> DataFrame:
    """Deterministic surrogate ids (S18): row_number over the natural-key
    order via the prefix-bucketed two-level plan (operators.upsert.
    surrogate_ids) — no single-task global sort.  First load only:
    incremental loads go through ``stable_ids`` so previously-published
    ids never move."""
    from politician_etl_project_spark.operators.upsert import surrogate_ids

    return surrogate_ids(df, order_cols, id_col)


# Enrichment columns written by a later pass (link_fec_ids): a plain
# update-wins merge would let a member refresh (whose fresh rows carry
# typed-NULL link columns) wipe previously-linked values, silently
# orphaning donation attribution until a manual re-link.
_POLITICIAN_LINK_COLS = ("fec_candidate_id", "fec_committee_id")


def load_politicians(wh: Warehouse, records: list[dict]) -> DataFrame:
    """Members API records → politicians dim with update-wins upsert
    (reference ON CONFLICT (congress_id) DO UPDATE,
    ingest_politicians.py:209-232).  Surrogate ids are stable across
    incremental loads; link-pass columns merge column-level (an incoming
    NULL never overwrites an existing linked value)."""
    fresh = members.transform_members(
        members.members_df(wh.spark, records), members.state_lookup(wh.spark)
    )
    tbl = wh["politicians"]
    if tbl.exists():
        prior = tbl.read()
        id_map = prior.select("congress_id", "politician_id")
        existing = prior.drop("politician_id")
        # schema evolution (S15 analog): later passes (link_fec_ids) widen
        # the dim; align fresh rows with typed nulls before the merge
        # sorted(): set iteration order is hash-salted per process, and
        # this order becomes the written schema order AND merge_keep's
        # value-column tie-break order — the byte-identical-replay
        # promise in the module docstring needs it deterministic
        for c in sorted(set(existing.columns) - set(fresh.columns)):
            fresh = fresh.withColumn(c, F.lit(None).cast(existing.schema[c].dataType))
        merged = merge_keep(existing, fresh, ["congress_id"], update_wins=True)
        link_cols = [c for c in _POLITICIAN_LINK_COLS if c in existing.columns]
        if link_cols:
            old_links = existing.select(
                "congress_id", *[F.col(c).alias(f"_old_{c}") for c in link_cols]
            )
            merged = merged.join(old_links, "congress_id", "left")
            for c in link_cols:
                merged = merged.withColumn(c, F.coalesce(F.col(c), F.col(f"_old_{c}"))).drop(
                    f"_old_{c}"
                )
        final = stable_ids(merged, id_map, ["congress_id"], "politician_id")
    else:
        final = _dense_ids(fresh, ["congress_id"], "politician_id")
    tbl.overwrite(final)
    wh.log("politicians", tbl.read().count())
    return tbl.read()


def link_fec_ids(wh: Warehouse, cn: DataFrame, ccl: DataFrame) -> DataFrame:
    """Entity-resolution pass (ingest_fec_links.py:95-192): fuzzy-match
    politicians to FEC candidates, then update-wins the linked columns
    onto the dim."""
    pol = wh.read("politicians")
    linked = fec.fuzzy_link_politicians(pol, fec.link_candidates(cn, ccl))
    n_linked = linked.count()  # materialize BEFORE the dim rewrite deletes its input files
    enriched = (
        pol.drop("fec_candidate_id", "fec_committee_id")
        .join(F.broadcast(linked.drop("score")), "politician_id", "left")
    )
    wh["politicians"].overwrite(enriched)
    wh.log("politicians", n_linked, notes="fec_link")
    return wh.read("politicians")


def load_bills(wh: Warehouse, billstatus_glob: str) -> DataFrame:
    """Billstatus XML → bills dim, sponsor resolved to politician_id via
    broadcast (update_bills.py:155-299; upsert keyed on
    (official_bill_number, congress))."""
    parsed = bills_xml.read_billstatus(wh.spark, billstatus_glob)
    fresh = bills_xml.extract_bills(parsed)
    pol = F.broadcast(
        wh.read("politicians").select(
            F.col("congress_id").alias("sponsor_bioguide"),
            F.col("politician_id").alias("sponsor_id"),
        )
    )
    fresh = fresh.join(pol, "sponsor_bioguide", "left").drop("sponsor_bioguide")
    tbl = wh["bills"]
    key = ["official_bill_number", "congress"]
    if tbl.exists():
        prior = tbl.read()
        merged = merge_keep(prior.drop("bill_id"), fresh, key, update_wins=True)
        final = stable_ids(merged, prior.select(*key, "bill_id"), key, "bill_id")
    else:
        final = _dense_ids(fresh, key, "bill_id")
    tbl.overwrite(final)
    wh.log("bills", tbl.read().count())
    return tbl.read()


def load_cosponsors(wh: Warehouse, billstatus_glob: str) -> DataFrame:
    """Cosponsor items from the same XML → bill_cosponsors, first-wins on
    (bill_id, politician_id) (ON CONFLICT DO NOTHING,
    ingest_bill_cosponsors.py:134-144)."""
    parsed = bills_xml.read_billstatus(wh.spark, billstatus_glob)
    raw = bills_xml.extract_cosponsors(parsed)
    pol = F.broadcast(wh.read("politicians").select("congress_id", "politician_id"))
    bills = F.broadcast(
        wh.read("bills").select("bill_id", "official_bill_number", "congress")
    )
    fresh = (
        raw.join(pol, "congress_id")
        .join(bills, ["official_bill_number", "congress"])
        .select("bill_id", "politician_id", "sponsorship_date", "is_original_cosponsor")
    )
    tbl = wh["bill_cosponsors"]
    merged = (
        merge_keep(tbl.read(), fresh, ["bill_id", "politician_id"], update_wins=False)
        if tbl.exists()
        else dedup_keys(fresh, ["bill_id", "politician_id"])
    )
    tbl.overwrite(merged)
    wh.log("bill_cosponsors", tbl.read().count())
    return tbl.read()


def load_votes(wh: Warehouse, votes_glob: str) -> DataFrame:
    """Vote JSON → votes fact: explode positions/voters, resolve ids by
    broadcast, first-wins upsert (ingest_votes.py:82-178)."""
    exploded = votes_json.explode_votes(votes_json.read_vote_files(wh.spark, votes_glob))
    fresh = votes_json.resolve_vote_ids(exploded, wh.read("politicians"), wh.read("bills"))
    tbl = wh["votes"]
    keys = Warehouse.KEYS["votes"]
    merged = (
        merge_keep(tbl.read(), fresh, keys, update_wins=False)
        if tbl.exists()
        else dedup_keys(fresh, keys)
    )
    tbl.overwrite(merged)
    wh.log("votes", tbl.read().count())
    return tbl.read()


def load_donations(wh: Warehouse, itcont_path: str) -> tuple[DataFrame, DataFrame]:
    """FEC bulk pipeline (ingest_bulk_donations.py:85-223): committee
    semi-join filter → coercions → donor build (first-wins) → donation
    facts resolved to (politician_id, donor_id).  Donations are keyed on
    fec_filing_id so re-runs are no-ops (the reference instead
    TRUNCATEs + reloads, S14 — same end state)."""
    spark = wh.spark
    pol = wh.read("politicians").filter(F.col("fec_committee_id").isNotNull())
    # the reference restricts the scan to committees of tracked politicians
    # (ingest_bulk_donations.py:43-58,92) — the committee IN-set is the
    # push-down filter that makes the 100 TB itcont scan cheap
    target = pol.select(F.col("fec_committee_id").alias("CMTE_ID")).distinct()
    # persist: the transformed scan feeds BOTH the donors build and the
    # facts build — uncached, the itcont CSV scan + coercions + committee
    # semi-join (the 100 TB cost center this docstring names) would
    # execute twice, once per table write
    raw = fec.transform_donations(fec.read_itcont(spark, itcont_path), target).persist()

    donors_fresh = fec.build_donors(raw).drop("donor_id")
    dtbl = wh["donors"]
    if dtbl.exists():
        prior = dtbl.read()
        donors_merged = merge_keep(
            prior.drop("donor_id"), donors_fresh, ["donor_source_key"], update_wins=False
        )
        donors_final = stable_ids(
            donors_merged, prior.select("donor_source_key", "donor_id"), ["donor_source_key"], "donor_id"
        )
    else:
        donors_final = _dense_ids(donors_fresh, ["donor_source_key"], "donor_id")
    dtbl.overwrite(donors_final)
    wh.log("donors", dtbl.read().count())

    donor_ids = wh.read("donors").select(
        F.col("donor_source_key").alias("donor_uid"), "donor_id"
    )
    pol_ids = F.broadcast(pol.select("fec_committee_id", "politician_id"))
    facts = (
        raw.join(pol_ids, "fec_committee_id")
        .join(donor_ids, "donor_uid")
        .select("politician_id", "donor_id", "amount", "date", "fec_filing_id")
    )
    ftbl = wh["donations"]
    merged = (
        merge_keep(ftbl.read(), facts, ["fec_filing_id"], update_wins=False)
        if ftbl.exists()
        else dedup_keys(facts, ["fec_filing_id"])
    )
    ftbl.overwrite(merged)
    wh.log("donations", ftbl.read().count())
    raw.unpersist()
    return wh.read("donors"), wh.read("donations")


def load_committees(
    wh: Warehouse, committee_docs: list[dict], membership_doc: dict, congress: int = 119
) -> None:
    """Committee YAML hierarchy + assignments (ingest_committees.py:48-222):
    update-wins on committee_id / (politician_id, committee_id, congress).
    ``congress`` stamps the membership snapshot — it is part of the
    assignment key, so a hardcoded value would overwrite the prior
    Congress's history instead of adding to it."""
    spark = wh.spark
    flat = committees_yaml.flatten_committees(committees_yaml.committees_df(spark, committee_docs))
    ctbl = wh["committees"]
    # first load DEDUPS like every other loader: a joint committee in
    # both chamber YAML feeds coalesces to one committee_id and must
    # persist once (the one-row-per-key invariant upsert relies on)
    merged = (
        merge_keep(ctbl.read(), flat, ["committee_id"], update_wins=True)
        if ctbl.exists()
        else dedup_keys(flat, ["committee_id"])
    )
    ctbl.overwrite(merged)
    wh.log("committees", ctbl.read().count())

    mem = committees_yaml.memberships_df(spark, membership_doc)
    pol = F.broadcast(wh.read("politicians").select(F.col("congress_id").alias("bioguide"), "politician_id"))
    fresh = mem.join(pol, "bioguide").select(
        "politician_id",
        "committee_id",
        "rank",
        F.col("title").alias("role"),
        "party",
        F.lit(congress).alias("congress"),
    )
    atbl = wh["committee_assignments"]
    keys = Warehouse.KEYS["committee_assignments"]
    amerged = (
        merge_keep(atbl.read(), fresh, keys, update_wins=True)
        if atbl.exists()
        else dedup_keys(fresh, keys)
    )
    atbl.overwrite(amerged)
    wh.log("committee_assignments", atbl.read().count())


def run_all(
    wh: Warehouse,
    member_records: list[dict],
    billstatus_glob: str,
    votes_glob: str,
    itcont_path: str,
    ccl_paths: list[str],
    cn_paths: list[str],
    committee_docs: list[dict],
    membership_doc: dict,
) -> Warehouse:
    """The run_all_updates.py order (FK dependencies): politicians →
    fec links → bills → cosponsors → votes → donations → committees."""
    spark = wh.spark
    ccl = fec.read_ccl(spark, *ccl_paths)
    cn = fec.read_cn(spark, *cn_paths)
    load_politicians(wh, member_records)
    link_fec_ids(wh, cn, ccl)
    load_bills(wh, billstatus_glob)
    load_cosponsors(wh, billstatus_glob)
    load_votes(wh, votes_glob)
    load_donations(wh, itcont_path)
    load_committees(wh, committee_docs, membership_doc)
    return wh
