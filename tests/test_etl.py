"""End-to-end ETL tests: the reference's run_all_updates flow
(bills → sponsors/cosponsors → votes → donations, FK order) over a
cross-linked fixture set, including idempotent re-run and incremental
update semantics."""

from __future__ import annotations

import json
import textwrap

import pytest
from pyspark.sql import functions as F

from politician_etl_project_spark import etl

MEMBERS = [
    {
        "bioguideId": "P000197",
        "name": "Pelosi, Nancy",
        "partyName": "Democratic",
        "state": "California",
        "terms": {"item": [{"chamber": "House of Representatives", "startYear": 1987}]},
    },
    {
        "bioguideId": "K000383",
        "name": "King, Angus",
        "partyName": "Independent",
        "state": "Maine",
        "terms": {"item": [{"chamber": "Senate", "startYear": 2013}]},
    },
]

BILL_XML = textwrap.dedent(
    """\
    <?xml version="1.0"?>
    <billStatus>
      <bill>
        <congress>119</congress>
        <type>HR</type>
        <number>123</number>
        <title>Clean Water Act</title>
        <introducedDate>2025-01-15</introducedDate>
        <sponsors><item><bioguideId>P000197</bioguideId></item></sponsors>
        <cosponsors>
          <item>
            <bioguideId>K000383</bioguideId>
            <sponsorshipDate>2025-01-16</sponsorshipDate>
            <isOriginalCosponsor>True</isOriginalCosponsor>
          </item>
        </cosponsors>
        <summaries><summary><text>A bill about water.</text></summary></summaries>
      </bill>
    </billStatus>
    """
)

VOTE_DOC = {
    "category": "passage",
    "date": "2025-03-14",
    "bill": {"type": "hr", "number": 123, "congress": 119},
    "votes": {
        "Yea": [{"id": "P000197", "party": "D", "state": "CA"}, "VP"],
        "Nay": [{"id": "K000383", "party": "I", "state": "ME"}],
    },
}

# CMTE C002 → Pelosi (H8CA05), C001 → King (S4ME01)
CN = (
    "H8CA05|PELOSI, NANCY|DEM|2024|CA|H|05|I|C|C002||||CA|94102\n"
    "S4ME01|KING, ANGUS|IND|2024|ME|S|00|I|C|C001||||ME|04101\n"
)
CCL = "H8CA05|2024|2024|C002|H|P|L1\nS4ME01|2024|2024|C001|S|P|L2\n"
ITCONT = (
    "C002|N|YE||img|15|IND|SMITH, JOHN|SF|CA|94110|ACME|ENG|03142024|500|||1|||SUB01\n"
    "C002|A|YE||img|15|IND|SMITH, JOHN|SF|CA|94110|ACME|ENG|03142024|500|||1|||SUB02\n"  # amendment
    "C001|N|YE||img|15|PAC|LOBSTER PAC|PORTLAND|ME|04101|||02012024|250|||1|||SUB03\n"
    "C001|N|YE||img|15|IND|SMITH, JOHN|SF|CA|94110|ACME|ENG|01052024|125.50|||1|||SUB04\n"
    "C999|N|YE||img|15|IND|NOBODY|X|XX|00000|||01012024|75|||1|||SUB05\n"  # unlinked cmte
)

COMMITTEES = [
    {
        "name": "House Committee on Agriculture",
        "type": "house",
        "thomas_id": "HSAG",
        "house_committee_id": "HSAG",
        "url": "http://ag.example",
        "subcommittees": [{"name": "Conservation", "thomas_id": "15"}],
    }
]
MEMBERSHIPS = {
    "HSAG": [
        {"name": "Nancy Pelosi", "bioguide": "P000197", "rank": 1, "title": "Chair", "party": "majority"},
        {"name": "Angus King", "bioguide": "K000383", "rank": 2, "party": "minority"},
    ]
}


@pytest.fixture(scope="module")
def staging(tmp_path_factory):
    d = tmp_path_factory.mktemp("staging")
    (d / "xml").mkdir()
    (d / "xml" / "hr123.xml").write_text(BILL_XML)
    (d / "votes").mkdir()
    (d / "votes" / "v1").mkdir()
    (d / "votes" / "v1" / "data.json").write_text(json.dumps(VOTE_DOC))
    (d / "cn.txt").write_text(CN)
    (d / "ccl.txt").write_text(CCL)
    (d / "itcont.txt").write_text(ITCONT)
    return d


def _run(spark, staging, root):
    wh = etl.Warehouse(spark, str(root))
    return etl.run_all(
        wh,
        member_records=MEMBERS,
        billstatus_glob=str(staging / "xml" / "*.xml"),
        votes_glob=str(staging / "votes" / "*" / "data.json"),
        itcont_path=str(staging / "itcont.txt"),
        ccl_paths=[str(staging / "ccl.txt")],
        cn_paths=[str(staging / "cn.txt")],
        committee_docs=COMMITTEES,
        membership_doc=MEMBERSHIPS,
    )


@pytest.fixture(scope="module")
def wh(spark, staging, tmp_path_factory):
    return _run(spark, staging, tmp_path_factory.mktemp("wh"))


def _snapshot(wh):
    return {
        name: sorted(map(str, wh.read(name).collect()))
        for name in wh.KEYS
        if name != "update_log"
    }


def test_politicians_linked(wh):
    pols = {r.congress_id: r for r in wh.read("politicians").collect()}
    assert set(pols) == {"P000197", "K000383"}
    assert pols["P000197"].fec_committee_id == "C002"
    assert pols["K000383"].fec_committee_id == "C001"
    assert pols["P000197"].fec_candidate_id == "H8CA05"
    # deterministic dense surrogate ids ordered by congress_id
    assert pols["K000383"].politician_id == 1
    assert pols["P000197"].politician_id == 2


def test_bills_and_cosponsors(wh):
    bills = {r.official_bill_number: r for r in wh.read("bills").collect()}
    assert set(bills) == {"HR123"}
    pelosi_id = (
        wh.read("politicians").filter(F.col("congress_id") == "P000197").collect()[0].politician_id
    )
    assert bills["HR123"].sponsor_id == pelosi_id
    cos = wh.read("bill_cosponsors").collect()
    assert len(cos) == 1 and cos[0].is_original_cosponsor is True


def test_votes_resolved(wh):
    votes = wh.read("votes").collect()
    assert {(v.vote_position) for v in votes} == {"Yea", "Nay"}
    assert all(v.bill_id == 1 for v in votes)


def test_donations_and_donors(wh):
    donors = {r.name: r for r in wh.read("donors").collect()}
    assert set(donors) == {"SMITH, JOHN", "LOBSTER PAC"}
    assert donors["LOBSTER PAC"].donor_type == "PAC"
    dons = wh.read("donations").collect()
    # SUB01 (C002→Pelosi), SUB03+SUB04 (C001→King); amendment + unlinked dropped
    assert {d.fec_filing_id for d in dons} == {"SUB01", "SUB03", "SUB04"}
    per_pol = {
        r.congress_id: str(r.total)
        for r in wh.read("donations")
        .join(wh.read("politicians"), "politician_id")
        .groupBy("congress_id")
        .agg(F.sum("amount").alias("total"))
        .collect()
    }
    assert per_pol == {"P000197": "500.00", "K000383": "375.50"}


def test_committees_loaded(wh):
    assert {r.committee_id for r in wh.read("committees").collect()} == {"HSAG", "HSAG15"}
    asg = {r.role for r in wh.read("committee_assignments").collect()}
    assert asg == {"Chair", None}


def test_update_log(wh):
    log = wh.read("update_log")
    tables_logged = {r.table_name for r in log.collect()}
    assert {"politicians", "bills", "votes", "donations", "donors"} <= tables_logged
    assert log.filter(F.col("status") != "success").count() == 0


def test_idempotent_rerun(spark, staging, wh):
    before = _snapshot(wh)
    _run(spark, staging, wh.root)  # replay the same staging input
    after = _snapshot(wh)
    assert before == after


def test_incremental_update_wins_and_first_wins(spark, staging, wh):
    """A second batch: Pelosi switches party (update-wins on the dim);
    a donor re-appears with different attributes (first-wins keeps the
    original); a brand-new donation appends."""
    etl.load_politicians(
        wh,
        [
            {
                "bioguideId": "P000197",
                "name": "Pelosi, Nancy",
                "partyName": "Independent",
                "state": "California",
                "terms": {"item": [{"chamber": "House of Representatives", "startYear": 1987}]},
            }
        ],
    )
    # update-wins: party changed, King untouched, ids still dense+stable
    pols = {r.congress_id: r for r in wh.read("politicians").collect()}
    assert pols["P000197"].party == "Independent"
    assert pols["K000383"].party == "Independent" or pols["K000383"].party  # King row intact
    assert {p.politician_id for p in pols.values()} == {1, 2}
    # column-level merge: the refresh batch carried NULL link columns, but
    # previously-linked FEC ids must survive WITHOUT a manual re-link
    assert pols["P000197"].fec_committee_id == "C002"
    assert pols["P000197"].fec_candidate_id == "H8CA05"
    inc = staging / "itcont_inc.txt"
    inc.write_text(
        # same donor uid as SUB01 but different city: first-wins keeps SF
        "C002|N|YE||img|15|IND|SMITH, JOHN|OAKLAND|CA|94110|ACME|ENG|04012024|300|||1|||SUB06\n"
    )
    etl.load_donations(wh, str(inc))
    donors = {r.name: r for r in wh.read("donors").collect()}
    assert donors["SMITH, JOHN"].city == "SF"  # first-wins preserved
    assert wh.read("donations").count() == 4  # SUB06 appended


def test_surrogate_ids_stable_under_early_sorting_key(spark, staging, wh):
    """A new politician whose congress_id sorts FIRST must not shift any
    existing id (persisted facts reference the old assignments); the new
    row gets max(existing)+1."""
    before = {r.congress_id: r.politician_id for r in wh.read("politicians").collect()}
    fact_refs_before = {r.politician_id for r in wh.read("donations").collect()}
    etl.load_politicians(
        wh,
        [
            {
                "bioguideId": "A000001",  # sorts before K000383 / P000197
                "name": "Aardvark, Alice",
                "partyName": "Independent",
                "state": "California",
                "terms": {"item": [{"chamber": "House of Representatives", "startYear": 2023}]},
            }
        ],
    )
    after = {r.congress_id: r.politician_id for r in wh.read("politicians").collect()}
    for cid, pid in before.items():
        assert after[cid] == pid, f"existing id moved: {cid} {pid} -> {after[cid]}"
    assert after["A000001"] == max(before.values()) + 1
    # every persisted FK still resolves to the same politician rows
    joined = (
        wh.read("donations")
        .join(wh.read("politicians"), "politician_id")
        .select("politician_id")
        .collect()
    )
    assert {r.politician_id for r in joined} == fact_refs_before


def test_swap_write_crash_recovery(spark, tmp_path):
    """_swap_write: a crash after the live dir is renamed aside must be
    recoverable — the next ParquetUpsertTable sees the old contents."""
    from politician_etl_project_spark.operators.upsert import ParquetUpsertTable

    path = str(tmp_path / "tbl")
    tbl = ParquetUpsertTable(spark, path, ["k"])
    tbl.overwrite(spark.createDataFrame([(1, "a")], "k int, v string"))
    # simulate dying between "rename live aside" and "publish staging"
    import os

    os.replace(path, path + ".old")
    assert not os.path.isdir(path)
    tbl2 = ParquetUpsertTable(spark, path, ["k"])  # recovery runs in __init__
    assert tbl2.exists()
    assert [tuple(r) for r in tbl2.read().collect()] == [(1, "a")]
    # a crash AFTER publish leaves main + .old: recovery keeps main, drops .old
    tbl2.overwrite(spark.createDataFrame([(2, "b")], "k int, v string"))
    os.makedirs(path + ".old", exist_ok=True)
    tbl3 = ParquetUpsertTable(spark, path, ["k"])
    assert not os.path.isdir(path + ".old")
    assert [tuple(r) for r in tbl3.read().collect()] == [(2, "b")]
