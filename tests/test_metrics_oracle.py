"""Reference-workload differential suite (SURVEY §5 item 2): the serving
layer's metric bundles re-validated against independently-written DuckDB
SQL over the SAME warehouse parquet — the closest analog of running the
reference's Postgres/BigQuery queries side-by-side with ours."""

from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from politician_etl_project_spark import metrics
from tests import test_etl


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("staging_mo")
    (d / "xml").mkdir()
    (d / "xml" / "hr123.xml").write_text(test_etl.BILL_XML)
    (d / "votes").mkdir()
    (d / "votes" / "v1").mkdir()
    (d / "votes" / "v1" / "data.json").write_text(json.dumps(test_etl.VOTE_DOC))
    (d / "cn.txt").write_text(test_etl.CN)
    (d / "ccl.txt").write_text(test_etl.CCL)
    (d / "itcont.txt").write_text(test_etl.ITCONT)
    return test_etl._run(spark, d, tmp_path_factory.mktemp("wh_mo"))


@pytest.fixture(scope="module")
def duck(wh):
    con = duckdb.connect()
    for name in wh.KEYS:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{wh.tables[name].path}/*.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, (int, float)) or hasattr(v, "quantize"):  # int/float/Decimal
        return round(float(v), 2)
    return str(v)


def _rows(df, cols):
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


def _duck(con, sql, ncols):
    return sorted(tuple(_canon(v) for v in r) for r in con.execute(sql).fetchall())


def test_financial_vs_duckdb(wh, duck):
    king = (
        wh.read("politicians").filter(F.col("congress_id") == "K000383").collect()[0].politician_id
    )
    out = metrics.financial_metrics(wh.read("donations"), wh.read("donors"), {"politician_id": king})

    got = _rows(out["total"], ["total_donations", "n_donations", "n_donors"])
    want = _duck(
        duck,
        f"""SELECT COALESCE(SUM(amount),0), COUNT(*), COUNT(DISTINCT donor_id)
            FROM donations WHERE politician_id = {king}""",
        3,
    )
    assert got == want

    got = _rows(out["by_type"], ["donor_type", "total", "n", "pct"])
    want = _duck(
        duck,
        f"""SELECT COALESCE(dn.donor_type,'Unknown') AS donor_type, SUM(d.amount) AS total,
                   COUNT(*) AS n,
                   ROUND(SUM(d.amount) * 100 / SUM(SUM(d.amount)) OVER (), 2) AS pct
            FROM donations d JOIN donors dn USING (donor_id)
            WHERE d.politician_id = {king}
            GROUP BY 1""",
        4,
    )
    assert got == want

    got = _rows(out["top_donors"], ["name", "donor_type", "total_donated"])
    want = _duck(
        duck,
        f"""SELECT dn.name, dn.donor_type, SUM(d.amount) AS total
            FROM donations d JOIN donors dn USING (donor_id)
            WHERE d.politician_id = {king}
            GROUP BY 1, 2 ORDER BY total DESC, dn.name LIMIT 10""",
        3,
    )
    assert got == want

    got = _rows(out["timeline"], ["month", "donor_type", "total"])
    want = _duck(
        duck,
        f"""SELECT strftime(date_trunc('month', d.date), '%Y-%m') AS month,
                   dn.donor_type, SUM(d.amount) AS total
            FROM donations d JOIN donors dn USING (donor_id)
            WHERE d.politician_id = {king}
            GROUP BY 1, 2""",
        3,
    )
    assert got == want


def test_legislative_vs_duckdb(wh, duck):
    sponsor = wh.read("bills").select("sponsor_id").filter("sponsor_id IS NOT NULL").collect()[0][0]
    out = metrics.legislative_metrics(wh.read("bills"), wh.read("bill_cosponsors"), sponsor)
    got = _rows(out["sponsored"], ["n_sponsored"])
    want = _duck(duck, f"SELECT COUNT(*) FROM bills WHERE sponsor_id = {sponsor}", 1)
    assert got == want

    cos = wh.read("bill_cosponsors").select("politician_id").collect()[0][0]
    out = metrics.legislative_metrics(wh.read("bills"), wh.read("bill_cosponsors"), cos)
    got = _rows(out["cosponsored"], ["n_cosponsored", "n_original", "n_joined_later"])
    want = _duck(
        duck,
        f"""SELECT COUNT(*),
                   SUM(CASE WHEN is_original_cosponsor THEN 1 ELSE 0 END),
                   SUM(CASE WHEN NOT is_original_cosponsor THEN 1 ELSE 0 END)
            FROM bill_cosponsors WHERE politician_id = {cos}""",
        3,
    )
    assert got == want


def test_committee_vs_duckdb(wh, duck):
    out = metrics.committee_metrics(
        wh.read("committee_assignments"),
        wh.read("committees"),
        wh.read("politicians"),
        "HSAG",
    )
    got = _rows(out["roster"], ["member_name", "role", "party"])
    want = _duck(
        duck,
        """SELECT p.first_name || ' ' || p.last_name, a.role, a.party
           FROM committee_assignments a JOIN politicians p USING (politician_id)
           WHERE a.committee_id = 'HSAG'""",
        3,
    )
    assert got == want
    got = _rows(out["n_members"], ["n_members"])
    want = _duck(
        duck,
        "SELECT COUNT(DISTINCT politician_id) FROM committee_assignments WHERE committee_id = 'HSAG'",
        1,
    )
    assert got == want


def test_voting_vs_duckdb(wh, duck):
    pelosi = (
        wh.read("politicians").filter(F.col("congress_id") == "P000197").collect()[0].politician_id
    )
    out = metrics.voting_metrics(wh.read("votes"), wh.read("bills"), pelosi)
    got = _rows(out["breakdown"], ["vote_position", "n"])
    want = _duck(
        duck,
        f"""SELECT COALESCE(vote_position,'Unknown'), COUNT(*)
            FROM votes WHERE politician_id = {pelosi} GROUP BY 1""",
        2,
    )
    assert got == want


def test_dashboard_vs_duckdb(wh, duck):
    got = {
        r.stat: r.value
        for r in metrics.dashboard_stats(
            {n: wh.read(n) for n in ("politicians", "donors", "donations", "bills", "votes")}
        ).collect()
    }
    for table in ("donors", "donations", "bills", "votes"):
        assert got[f"{table}_total"] == duck.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
    assert (
        got["politicians_house"]
        == duck.execute("SELECT COUNT(*) FROM politicians WHERE chamber = 'House'").fetchone()[0]
    )


def test_pagination_vs_duckdb(wh, duck):
    page, total = metrics.paginate_politicians(wh.read("politicians"), {}, skip=0, limit=10)
    assert total == duck.execute("SELECT COUNT(*) FROM politicians").fetchone()[0]
    got = [r.congress_id for r in page.collect()]
    want = [
        r[0]
        for r in duck.execute(
            "SELECT congress_id FROM politicians ORDER BY last_name, first_name, congress_id LIMIT 10"
        ).fetchall()
    ]
    assert got == want
