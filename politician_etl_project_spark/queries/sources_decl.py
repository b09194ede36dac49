"""Declared queries that put the SOURCE operator families (SURVEY S1-S8,
N1-N6, F6-F8, F16, J8) under the driver's hard correctness gate.

The driver only provides the ten parquet tables, so each query here
materializes a small DETERMINISTIC fixture file under a fixed /tmp path
(idempotent tmp-file + rename; content is literal, never random) and
runs the real source module against it — the same modules the warehouse
ETL uses.  The oracles read the SAME fixture through DuckDB's own
readers (read_csv / read_text + json_each) or, where DuckDB has no
reader (XML, YAML), assert the hand-derived expected rows as literal
VALUES — independent of the implementation either way.

Reference surfaces covered: pipe-CSV chunk scan + coercions
(scripts/ingest_bulk_donations.py:85-151), recursive vote JSON with the
heterogeneous '"VP"' voter arrays (scripts/ingest_votes.py:82-178),
billstatus XML cosponsor extraction (scripts/update_bills.py:155-239),
committee YAML hierarchy flatten (scripts/ingest_committees.py:19-95).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politician_etl_project_spark.queries.registry import declared_query

FIXTURE_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_fixtures_v1")

# --- fixture payloads (literal, deterministic) -----------------------------

_ITCONT_ROWS = [
    # CMTE_ID|AMNDT|RPT|PGI|IMG|TTP|ENTITY|NAME|CITY|STATE|ZIP|EMPLOYER|OCC|DT|AMT|OTH|TRAN|FILE|MEMOCD|MEMOTXT|SUB
    "C001|N|YE||img|15|IND|ALICE SMITH|AUSTIN|TX|78701|ACME|ENG|03152024|250.00||||||SUB001",
    "C001|N|YE||img|15|IND|ALICE SMITH|AUSTIN|TX|78701|ACME|ENG|04012024|100.50||||||SUB002",
    "C001|A|YE||img|15|IND|AMENDED ROW|AUSTIN|TX|78701|ACME|ENG|03152024|999.00||||||SUB003",
    "C001|N|YE||img|15|PAC|GOOD GOV PAC|DALLAS|TX|75201|PAC LLC|ORG|05202024|5000.00||||||SUB004",
    "C001|N|YE||img|15|ORG|CIVIC ORG|DALLAS|TX|75201||ORG|05212024|750.25||||||SUB005",
    "C002|N|YE||img|15|IND|BOB JONES|HOUSTON|TX|77002|WIDGETS|MGR|06012024|42.42||||||SUB006",
    "C002|N|YE||img|15|IND|BOB JONES|HOUSTON|TX|77002|WIDGETS|MGR|13459999|10.00||||||SUB007",
    "C002|N|YE||img|15|IND|CARA LEE|MIAMI|FL|33101||NURSE|07042024|not_a_number||||||SUB008",
    "C002|N|YE||img|15|COM|JOINT CMTE|MIAMI|FL|33101|JC|ORG|07052024|1200.00||||||SUB009",
    "C003|N|YE||img|15|IND|DAN WU|RENO|NV|89501|CASINO|DLR|08152024|300.00||||||SUB010",
    "C003|N|YE||img|15|IND||RENO|NV|89501||DLR|08162024|75.00||||||SUB011",
    "C999|N|YE||img|15|IND|ED UNTARGETED|NYC|NY|10001|BANK|ANL|09012024|10000.00||||||SUB012",
    # short malformed line (S3 tolerance: PERMISSIVE pads with nulls ->
    # amount/date null -> dropped by the transform)
    "C001|N|YE||img|15|IND|SHORT LINE|AUSTIN|TX",
]

_VOTE_FILE_1 = {
    "category": "passage",
    "date": "2024-01-15",
    "bill": {"type": "hr", "number": 100, "congress": 118},
    "votes": {
        "Yea": [
            {"id": "A000001", "party": "D", "state": "TX"},
            {"id": "A000002", "party": "R", "state": "FL"},
            "VP",
        ],
        "Nay": [{"id": "A000003", "party": "R", "state": "NV"}],
    },
}
_VOTE_FILE_2 = {
    "category": "passage",
    "date": "2024-02-20",
    "bill": {"type": "s", "number": 55, "congress": 118},
    "votes": {
        "Yea": [{"id": "A000003", "party": "R", "state": "NV"}],
        "Not Voting": [{"id": "A000001", "party": "D", "state": "TX"}],
    },
}
# N3: nominations and missing bills are skipped
_VOTE_FILE_3 = {
    "category": "nomination",
    "date": "2024-03-01",
    "votes": {"Yea": [{"id": "A000009", "party": "D", "state": "CA"}]},
}

_BILL_XML_1 = """<billStatus>
  <bill>
    <congress>118</congress>
    <type>hr</type>
    <number>100</number>
    <title>Data Act</title>
    <introducedDate>2023-03-15</introducedDate>
    <sponsors><item><bioguideId>S000001</bioguideId></item></sponsors>
    <cosponsors>
      <item>
        <bioguideId>A000001</bioguideId>
        <sponsorshipDate>2023-03-16</sponsorshipDate>
        <isOriginalCosponsor>True</isOriginalCosponsor>
      </item>
      <item>
        <bioguideId>A000002</bioguideId>
        <sponsorshipDate>2023-04-01</sponsorshipDate>
        <isOriginalCosponsor>false</isOriginalCosponsor>
      </item>
    </cosponsors>
    <summaries><summary><text>A bill about data.</text></summary></summaries>
  </bill>
</billStatus>
"""
_BILL_XML_2 = """<billStatus>
  <bill>
    <congress>118</congress>
    <type>s</type>
    <number>55</number>
    <title>Ethics Act</title>
    <introducedDate>2023-05-02</introducedDate>
    <sponsors><item><bioguideId>S000002</bioguideId></item></sponsors>
    <cosponsors>
      <item>
        <bioguideId>A000003</bioguideId>
        <sponsorshipDate>2023-05-10</sponsorshipDate>
        <isOriginalCosponsor>true</isOriginalCosponsor>
      </item>
    </cosponsors>
  </bill>
</billStatus>
"""
# no cosponsors at all: explode_outer + null filter must drop it cleanly
_BILL_XML_3 = """<billStatus>
  <bill>
    <congress>119</congress>
    <type>hr</type>
    <number>7</number>
    <title>Short Act</title>
    <introducedDate>2025-01-09</introducedDate>
    <sponsors><item><bioguideId>S000003</bioguideId></item></sponsors>
  </bill>
</billStatus>
"""

_COMMITTEES_YAML = """\
- name: Committee on Data
  type: house
  thomas_id: HSDA
  house_committee_id: HSDA00
  url: https://example.test/data
  subcommittees:
    - name: Subcommittee on Storage
      thomas_id: "01"
    - name: Subcommittee on Compute
      thomas_id: "02"
- name: Committee on Ethics
  type: senate
  thomas_id: SSET
  senate_committee_id: SSET00
- name: Joint Committee on Printing
  type: joint
  thomas_id: JSPR
"""


# Congress-member API page (reference ingest_politicians.py:54-232):
# every transform edge is present — comma name split (M001), no-comma
# name (M002), suffix after a second comma kept in first_name (M003),
# unknown state dropped (M004), EMPTY terms list (M005: null chamber,
# sentinel years), and ISO-date term years instead of integers (M006).
_MEMBERS_PAGE = [
    {
        "bioguideId": "M001", "name": "Smith, Alice", "partyName": "D",
        "state": "Texas",
        "terms": {"item": [
            {"chamber": "House of Representatives", "startYear": 2019, "endYear": 2021},
            {"chamber": "Senate", "startYear": 2021},
        ]},
    },
    {
        "bioguideId": "M002", "name": "Cher", "partyName": "I",
        "state": "California",
        "terms": {"item": [
            {"chamber": "House of Representatives", "startYear": 2017, "endYear": 2019},
        ]},
    },
    {
        "bioguideId": "M003", "name": "Jones, Bob, Jr.", "partyName": "R",
        "state": "New York",
        "terms": {"item": [
            {"chamber": "House of Representatives", "startYear": 2015, "endYear": 2017},
            {"chamber": "House of Representatives", "startYear": 2017, "endYear": 2019},
            {"chamber": "House of Representatives", "startYear": 2019},
        ]},
    },
    {
        "bioguideId": "M004", "name": "Doe, Jane", "partyName": "R",
        "state": "Atlantis",
        "terms": {"item": [{"chamber": "Senate", "startYear": 2011, "endYear": 2017}]},
    },
    {
        "bioguideId": "M005", "name": "Term, Less", "partyName": "R",
        "state": "Nevada",
        "terms": {"item": []},
    },
    {
        "bioguideId": "M006", "name": "Dates, Ann", "partyName": "D",
        "state": "Guam",
        "terms": {"item": [
            {"chamber": "Senate", "start": "2020-01-03", "end": "2024-01-03"},
        ]},
    },
]


def _write(path: str, text: str) -> None:
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def ensure_fixtures() -> str:
    """Write every fixture (idempotent); returns the fixture root."""
    d = FIXTURE_DIR
    _write(os.path.join(d, "itcont.txt"), "\n".join(_ITCONT_ROWS) + "\n")
    for i, doc in enumerate([_VOTE_FILE_1, _VOTE_FILE_2, _VOTE_FILE_3], start=1):
        _write(os.path.join(d, "votes", f"vote{i}", "data.json"), json.dumps(doc, indent=1))
    for i, xml in enumerate([_BILL_XML_1, _BILL_XML_2, _BILL_XML_3], start=1):
        _write(os.path.join(d, "bills", f"BILLSTATUS-{i}.xml"), xml)
    _write(os.path.join(d, "committees.yaml"), _COMMITTEES_YAML)
    _write(os.path.join(d, "members.json"), json.dumps({"members": _MEMBERS_PAGE}, indent=1))
    return d


# write at import too: load_all() imports this module before the driver
# runs EITHER side, so the oracle's read_csv/read_text never races the
# Spark query for fixture existence
ensure_fixtures()

_ITCONT_PATH = os.path.join(FIXTURE_DIR, "itcont.txt")
_VOTES_GLOB = os.path.join(FIXTURE_DIR, "votes", "*", "data.json")
_BILLS_GLOB = os.path.join(FIXTURE_DIR, "bills", "*.xml")
_YAML_PATH = os.path.join(FIXTURE_DIR, "committees.yaml")

_ITCONT_NAMES = (
    "'CMTE_ID','AMNDT_IND','RPT_TP','TRANSACTION_PGI','IMAGE_NUM',"
    "'TRANSACTION_TP','ENTITY_TP','NAME','CITY','STATE','ZIP_CODE',"
    "'EMPLOYER','OCCUPATION','TRANSACTION_DT','TRANSACTION_AMT',"
    "'OTHER_ID','TRAN_ID','FILE_NUM','MEMO_CD','MEMO_TEXT','SUB_ID'"
)


@declared_query(
    "q_src_fec_csv",
    oracle=f"""
WITH raw AS (
  SELECT * FROM read_csv('{_ITCONT_PATH}', delim='|', header=false,
                         names=[{_ITCONT_NAMES}], all_varchar=true,
                         null_padding=true)
), typed AS (
  SELECT CMTE_ID AS fec_committee_id,
         coalesce(NAME,'') || '|' || coalesce(ZIP_CODE,'') || '|' || coalesce(EMPLOYER,'') AS donor_uid,
         CASE WHEN ENTITY_TP IN ('PAC','COM','ORG') THEN 'PAC' ELSE 'Individual' END AS donor_type,
         CAST(try_strptime(TRANSACTION_DT, '%m%d%Y') AS DATE) AS date,
         try_cast(TRANSACTION_AMT AS DECIMAL(12,2)) AS amount
  FROM raw
  WHERE AMNDT_IND = 'N' AND CMTE_ID IN ('C001','C002','C003')
)
SELECT fec_committee_id, donor_type,
       CAST(COUNT(*) AS BIGINT) AS n_donations,
       CAST(COUNT(DISTINCT donor_uid) AS BIGINT) AS n_donors,
       CAST(SUM(amount) AS DOUBLE) AS total_amount,
       strftime(MIN(date), '%Y-%m-%d') AS first_date,
       strftime(MAX(date), '%Y-%m-%d') AS last_date
FROM typed
WHERE amount IS NOT NULL AND date IS NOT NULL
GROUP BY fec_committee_id, donor_type
ORDER BY fec_committee_id, donor_type
""",
    ops=("S1", "S2", "S3", "F6", "F7", "F8", "P2", "P4", "P6", "A2"),
    doc="The FEC bulk pipe-CSV chunk pipeline (reference "
    "ingest_bulk_donations.py:85-151) against a deterministic fixture, "
    "verified cell-for-cell against DuckDB's OWN csv reader: headerless "
    "pipe scan tolerating a short line (PERMISSIVE ~ null_padding), "
    "amendment filter, committee IN-set, null-safe composite donor uid, "
    "MMDDYYYY try-parse, decimal try-cast, null drops, then a grouped "
    "rollup.  Every coercion edge (bad date, bad amount, null name/"
    "employer, short line) is present in the fixture.",
)
def q_src_fec_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.sources import fec

    ensure_fixtures()
    target = spark.createDataFrame([("C001",), ("C002",), ("C003",)], "CMTE_ID string")
    raw = fec.transform_donations(fec.read_itcont(spark, _ITCONT_PATH), target)
    return (
        raw.groupBy("fec_committee_id", "donor_type")
        .agg(
            F.count("*").alias("n_donations"),
            F.countDistinct("donor_uid").alias("n_donors"),
            F.sum("amount").alias("total_amount"),
            F.date_format(F.min("date"), "yyyy-MM-dd").alias("first_date"),
            F.date_format(F.max("date"), "yyyy-MM-dd").alias("last_date"),
        )
        .orderBy("fec_committee_id", "donor_type")
    )


@declared_query(
    "q_src_votes_json",
    oracle=f"""
WITH files AS (
  SELECT content AS j FROM read_text('{_VOTES_GLOB}')
), valid AS (
  SELECT j FROM files
  WHERE json_extract_string(j, '$.category') <> 'nomination'
    AND json_extract(j, '$.bill') IS NOT NULL
), positions AS (
  SELECT t.j, k AS vote_position,
         json_extract(t.j, '$.votes."' || k || '"') AS voter_arr
  FROM valid t, unnest(json_keys(t.j, '$.votes')) AS pos(k)
), voters AS (
  SELECT j, vote_position,
         json_extract_string(voter_arr, '$[' || CAST(i AS VARCHAR) || '].id') AS congress_id
  FROM positions, unnest(range(CAST(json_array_length(voter_arr) AS BIGINT))) AS idx(i)
)
SELECT congress_id,
       upper(json_extract_string(j, '$.bill.type'))
         || CAST(CAST(json_extract(j, '$.bill.number') AS INTEGER) AS VARCHAR)
         || '-' || CAST(CAST(json_extract(j, '$.bill.congress') AS INTEGER) AS VARCHAR)
         AS bill_key,
       strftime(CAST(json_extract_string(j, '$.date') AS DATE), '%Y-%m-%d') AS vote_date,
       vote_position,
       json_extract_string(j, '$.category') AS vote_category
FROM voters
WHERE congress_id IS NOT NULL
ORDER BY bill_key, vote_position, congress_id
""",
    ops=("S6", "N1", "N2", "N3", "J8"),
    doc="Recursive vote-JSON scan + heterogeneous-array flatten "
    "(reference ingest_votes.py:82-178) against fixture files, verified "
    "against DuckDB's json_each over the same files: nomination/"
    "missing-bill skip (N3), position-map explode (N1), the literal "
    "'\"VP\"' voter string parsing to a null-id struct and dropping "
    "(N2), composite TYPE+NUMBER-CONGRESS bill key (J8).",
)
def q_src_votes_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.sources import votes_json

    ensure_fixtures()
    exploded = votes_json.explode_votes(votes_json.read_vote_files(spark, _VOTES_GLOB))
    return exploded.select(
        "congress_id",
        "bill_key",
        F.date_format("date", "yyyy-MM-dd").alias("vote_date"),
        "vote_position",
        "vote_category",
    ).orderBy("bill_key", "vote_position", "congress_id")


@declared_query(
    "q_src_bills_xml",
    oracle="""
SELECT * FROM (VALUES
  ('HR100', 118, 'Data Act', 'S000001', 'A000001', '2023-03-16', TRUE),
  ('HR100', 118, 'Data Act', 'S000001', 'A000002', '2023-04-01', FALSE),
  ('S55',   118, 'Ethics Act', 'S000002', 'A000003', '2023-05-10', TRUE)
) AS t(official_bill_number, congress, title, sponsor_bioguide,
       cosponsor_bioguide, sponsorship_date, is_original_cosponsor)
ORDER BY official_bill_number, cosponsor_bioguide
""",
    ops=("S7", "N4", "F16", "J8"),
    doc="Billstatus XML pipeline (reference update_bills.py:155-239): "
    "whole-file read, from_xml with nested schema, cosponsor-array "
    "explode (N4), 'True'/'false' boolean parse (F16), then the "
    "composite-key join back to the bill headers (J8).  DuckDB has no "
    "XML reader, so the oracle is the hand-derived expected relation as "
    "literal VALUES — the fixture has a no-cosponsor bill that must "
    "vanish through explode_outer + null filter.",
)
def q_src_bills_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.sources import bills_xml

    ensure_fixtures()
    parsed = bills_xml.read_billstatus(spark, _BILLS_GLOB)
    bills = bills_xml.extract_bills(parsed).select(
        "official_bill_number", "congress", "title", "sponsor_bioguide"
    )
    cos = bills_xml.extract_cosponsors(parsed)
    return (
        cos.join(F.broadcast(bills), ["official_bill_number", "congress"])
        .select(
            "official_bill_number",
            "congress",
            "title",
            "sponsor_bioguide",
            F.col("congress_id").alias("cosponsor_bioguide"),
            F.date_format("sponsorship_date", "yyyy-MM-dd").alias("sponsorship_date"),
            "is_original_cosponsor",
        )
        .orderBy("official_bill_number", "cosponsor_bioguide")
    )


@declared_query(
    "q_src_committees_yaml",
    oracle="""
SELECT * FROM (VALUES
  ('HSDA00',   'Committee on Data',          'house',  'standing',     NULL),
  ('HSDA0001', 'Subcommittee on Storage',    'house',  'subcommittee', 'HSDA00'),
  ('HSDA0002', 'Subcommittee on Compute',    'house',  'subcommittee', 'HSDA00'),
  ('JSPR',     'Joint Committee on Printing','joint',  'standing',     NULL),
  ('SSET00',   'Committee on Ethics',        'senate', 'standing',     NULL)
) AS t(committee_id, name, chamber, type, parent_committee_id)
ORDER BY committee_id
""",
    ops=("S8", "N6", "J5"),
    doc="Committee YAML hierarchy flatten (reference "
    "ingest_committees.py:19-95): driver-side YAML parse (documents are "
    "~100 KB — S8's contract), then the distributed parent∪subcommittee "
    "flatten with synthesized ids and the upstream type/chamber field "
    "swap.  DuckDB has no YAML reader; the oracle is the hand-derived "
    "flatten as literal VALUES.",
)
def q_src_committees_yaml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.sources import committees_yaml

    ensure_fixtures()
    import yaml

    with open(_YAML_PATH) as f:
        docs = yaml.safe_load(f)
    flat = committees_yaml.flatten_committees(
        committees_yaml.committees_df(spark, docs)
    )
    return flat.select(
        "committee_id", "name", "chamber", "type", "parent_committee_id"
    ).orderBy("committee_id")


@declared_query(
    "q_src_members",
    oracle="""
SELECT * FROM (VALUES
  ('M001', 'Alice',     'Smith', 'D', 'TX', 'Senate',            2019, 2021, true),
  ('M002', CAST(NULL AS VARCHAR), 'Cher', 'I', 'CA', 'House',    2017, 2019, false),
  ('M003', 'Bob, Jr.',  'Jones', 'R', 'NY', 'House',             2015, 2019, true),
  ('M005', 'Less',      'Term',  'R', 'NV', CAST(NULL AS VARCHAR), -1, -1,   false),
  ('M006', 'Ann',       'Dates', 'D', 'GU', 'Senate',            2020, 2024, false)
) AS t(congress_id, first_name, last_name, party, state, chamber,
       start_year, end_year, is_active)
ORDER BY congress_id
""",
    ops=("S5", "N5", "F4", "F5", "F15", "J7"),
    doc="Congress-member page transform (reference "
    "ingest_politicians.py:115-188) against a deterministic API-page "
    "fixture: first-comma name split (suffix stays in first_name), "
    "broadcast state-name lookup dropping unknown states, last-term "
    "chamber with the House rename, terms min/max year with the "
    "ISO-date fallback, and the active flag from a missing endYear.  "
    "An EMPTY terms list yields null chamber + sentinel years instead "
    "of aborting under ANSI (try_element_at).  The oracle is the "
    "hand-derived transform as literal VALUES — promotes F15/N5 from "
    "pytest-only to the driver's hard gate.  Years are coalesced to "
    "-1 on both sides (nullable-numeric driver hazard).",
)
def q_src_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.sources import members

    ensure_fixtures()
    # members_json_df: JVM file scan of the staged page, NOT the
    # driver-side createDataFrame route (members_df) — row-equality of
    # the two paths is pinned in tests/test_sources.py
    out = members.transform_members(
        members.members_json_df(spark, os.path.join(FIXTURE_DIR, "members.json")),
        members.state_lookup(spark),
    )
    return out.select(
        "congress_id",
        "first_name",
        "last_name",
        "party",
        "state",
        "chamber",
        F.coalesce("start_year", F.lit(-1)).alias("start_year"),
        F.coalesce("end_year", F.lit(-1)).alias("end_year"),
        "is_active",
    ).orderBy("congress_id")


# --- S9: live JDBC round trip over the bundled Derby engine ----------------
# The reference reads Postgres through pooled SQLAlchemy sessions
# (app/database.py:18-24) and psycopg2 batch inserts
# (scripts/ingest_fec_links.py:63).  No Postgres exists in this container,
# but Spark BUNDLES Apache Derby (its Hive-metastore store), whose
# embedded JDBC driver is a real database engine — so the S9 path can
# move real rows end-to-end: Spark JDBC WRITE into Derby, then the
# partition-parallel JDBC READ (catalog.load_table_jdbc) back out, with
# Catalyst pushing filters into the generated SQL (PushedFilters shows
# in explain).  Derby embedded is single-JVM, so the database is built
# once per PROCESS (an on-disk cache shared across processes would trip
# Derby's db.lck boot lock).

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
_DERBY_DBS: dict[str, tuple[str, int, int]] = {}


def _ensure_derby_orders(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Load orders into a process-local embedded Derby database (once);
    returns (jdbc_url, min_orderkey, max_orderkey).  Money is stored as
    BIGINT cents — DECIMAL(12,2)*100 is exact — so sums replay
    bit-for-bit on every engine."""
    import uuid

    from pyspark.sql import functions as F

    from politician_etl_project_spark.catalog import load_table

    if sf_dir in _DERBY_DBS:
        return _DERBY_DBS[sf_dir]
    db = os.path.join(
        tempfile.gettempdir(), f"spark_graft_derby_{os.getpid()}_{uuid.uuid4().hex[:6]}", "db"
    )
    url = f"jdbc:derby:{db};create=true"
    # floor(x*100 + 0.5), NOT a bare cast: o_totalprice is DOUBLE, so
    # x*100 lands within ~1e-10 of the true cent count on either side —
    # Spark's bigint cast TRUNCATES while DuckDB's ROUNDS, and the two
    # disagree on every value that lands just below the integer.  The
    # explicit identical expression is exact on both engines.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("o_totalcents"),
        "o_orderdate",
    )
    orders.write.format("jdbc").option("url", url).option("dbtable", "ORDERS_J").option(
        "driver", _DERBY_DRIVER
    ).mode("overwrite").save()
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    # empty table: bounds are NULL — any (lo < hi) pair partitions an
    # empty range correctly, so pin (0, 1) instead of crashing
    _DERBY_DBS[sf_dir] = (url, int(lo) if lo is not None else 0, int(hi) if hi is not None else 1)
    return _DERBY_DBS[sf_dir]


@declared_query(
    "q_src_jdbc",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS last_key,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    ops=("S9", "A2", "P2"),
    doc="LIVE JDBC round trip (S9): orders loads into an embedded Derby "
    "database (the JDBC engine Spark itself bundles) via the JDBC "
    "writer, then reads BACK through catalog.load_table_jdbc's "
    "partition-parallel scan (8 o_orderkey range slices, the exact "
    "layout a Postgres fact extract uses) and aggregates per status.  "
    "The oracle computes the same rollup from the parquet table "
    "directly — a green hash proves the database round trip lost "
    "nothing: types, money (stored as exact BIGINT cents), dates, "
    "row multiplicity.  Filter pushdown into the database's SQL is "
    "plan-asserted in tests/test_sources.py.  Replaces the previous "
    "'no JDBC jar in this container' documentation gap — the reference "
    "analog is its pooled-Postgres read path (app/database.py:18-24).",
)
def q_src_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.catalog import load_table_jdbc

    url, lo, hi = _ensure_derby_orders(spark, sf_dir)
    back = load_table_jdbc(
        spark,
        url,
        "ORDERS_J",
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=8,
        driver=_DERBY_DRIVER,
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("o_totalcents").cast("bigint").alias("total_cents"),
            F.min("o_orderkey").cast("bigint").alias("first_key"),
            F.max("o_orderkey").cast("bigint").alias("last_key"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
        )
        .orderBy("o_orderstatus")
    )


@declared_query(
    "q_provenance_audit",
    oracle="""
SELECT src_file, n_rows, key_min, key_max FROM (
  SELECT 'documents.parquet' AS src_file, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(MIN(doc_id) AS BIGINT) AS key_min, CAST(MAX(doc_id) AS BIGINT) AS key_max
  FROM documents
  UNION ALL
  SELECT 'events.parquet', CAST(COUNT(*) AS BIGINT),
         CAST(MIN(event_id) AS BIGINT), CAST(MAX(event_id) AS BIGINT)
  FROM events
)
ORDER BY src_file
""",
    ops=("S6", "S17", "PIPE-provenance"),
    doc="File-provenance audit: every scanned row is tagged with its "
    "source file via input_file_name() (basename-extracted so the "
    "audit is location-independent) and rolled up to per-file row "
    "counts + key ranges — the lineage record an ingest run writes "
    "next to its watermark (reference: per-script processed/inserted "
    "counter prints, scripts/ingest_bulk_donations.py:219-223, made "
    "queryable).  At scale this is a narrow map + tiny agg per file; "
    "with directory-partitioned sources the same expression yields "
    "per-partition-file audit rows that pinpoint a bad producer file "
    "in a 100k-file lake without re-reading payload columns (footer "
    "stats make min/max cheap).",
)
def q_provenance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("src_file"),
        F.col("doc_id").alias("key"),
    )
    evs = load_table(spark, sf_dir, "events").select(
        F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("src_file"),
        F.col("event_id").alias("key"),
    )
    return (
        docs.unionByName(evs)
        .groupBy("src_file")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("key").cast("bigint").alias("key_min"),
            F.max("key").cast("bigint").alias("key_max"),
        )
        .orderBy("src_file")
    )


_DRIFT_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_drift_v1")


def _ensure_drift_store(spark: SparkSession) -> str:
    """Two deterministic parquet generations of the same logical table —
    gen2 adds a column — written once under a fixed path (staging +
    rename, same discipline as the stored indexes) so the DuckDB oracle
    can DESCRIBE the identical files."""
    from politician_etl_project_spark.catalog import ensure_built_dir

    def _build(staging: str) -> None:
        spark.sql(
            "SELECT CAST(1 AS BIGINT) AS doc_id, 'en' AS lang"
        ).write.mode("overwrite").parquet(os.path.join(staging, "gen1"))
        spark.sql(
            "SELECT CAST(2 AS BIGINT) AS doc_id, 'de' AS lang, CAST(42 AS BIGINT) AS n_chars"
        ).write.mode("overwrite").parquet(os.path.join(staging, "gen2"))

    return ensure_built_dir(_DRIFT_DIR, _build)


@declared_query(
    "q_schema_drift",
    oracle=f"""
WITH o AS (
  SELECT column_name AS col FROM (DESCRIBE SELECT * FROM read_parquet('{_DRIFT_DIR}/gen1/*.parquet'))
), n AS (
  SELECT column_name AS col FROM (DESCRIBE SELECT * FROM read_parquet('{_DRIFT_DIR}/gen2/*.parquet'))
)
SELECT COALESCE(o.col, n.col) AS column_name,
       (o.col IS NOT NULL) AS in_old,
       (n.col IS NOT NULL) AS in_new,
       CASE WHEN o.col IS NULL THEN 'added'
            WHEN n.col IS NULL THEN 'removed'
            ELSE 'kept' END AS status
FROM o FULL OUTER JOIN n ON o.col = n.col
ORDER BY column_name
""",
    ops=("DQ-schema-drift", "S15"),
    doc="Schema-drift report between two stored generations of a table: "
    "reader schemas come from the parquet FOOTERS (pure metadata — no "
    "data IO at any table size), and the full-outer diff labels every "
    "column kept/added/removed.  This is the reference's "
    "check_schema.py INFORMATION_SCHEMA dump (app/check_schema.py:10-37) "
    "as an engine query, and the audit that runs before mergeSchema "
    "reads (q_schema_evolution) are trusted in production.  The report "
    "frame is built as a VALUES literal (createDataFrame's py4j "
    "conversion costs ~0.8 s/call for tiny frames — SCALE.md lesson).",
)
def q_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _ensure_drift_store(spark)
    old_cols = spark.read.parquet(os.path.join(store, "gen1")).schema.names
    new_cols = spark.read.parquet(os.path.join(store, "gen2")).schema.names
    all_cols = sorted(set(old_cols) | set(new_cols))
    rows = []
    for c in all_cols:
        in_old, in_new = c in old_cols, c in new_cols
        status = "kept" if (in_old and in_new) else ("added" if in_new else "removed")
        rows.append(f"('{c}', {str(in_old).lower()}, {str(in_new).lower()}, '{status}')")
    return spark.sql(
        "SELECT column_name, in_old, in_new, status FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(column_name, in_old, in_new, status) ORDER BY column_name"
    )
