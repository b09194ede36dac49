"""Vote JSON pipeline (SURVEY S6, N1-N3, J7/J8; reference
``scripts/ingest_votes.py:82-178``).

The reference os.walks data/{congress}/votes/{year}/**/data.json and
loops positions→voters in Python.  Spark-first: one multiLine JSON scan
with an explicit schema where ``votes`` is MAP<position, ARRAY<string>> —
the voter entries are kept as raw JSON strings because the arrays are
*heterogeneous*: the Vice-President appears as the literal string '"VP"'
among voter objects (ingest_votes.py:133-135).  A struct-typed schema
would mark the whole record corrupt; reading elements as strings and
``from_json``-ing them turns '"VP"' into a null-id struct that one filter
drops (N2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

VOTER = StructType(
    [
        StructField("id", StringType()),
        StructField("party", StringType()),
        StructField("state", StringType()),
    ]
)

VOTE_SCHEMA = StructType(
    [
        StructField("category", StringType()),
        StructField("date", StringType()),
        StructField(
            "bill",
            StructType(
                [
                    StructField("type", StringType()),
                    StructField("number", IntegerType()),
                    StructField("congress", IntegerType()),
                ]
            ),
        ),
        # heterogeneous array -> elements kept as raw JSON text (see module doc)
        StructField("votes", MapType(StringType(), ArrayType(StringType()))),
    ]
)


def read_vote_files(spark: SparkSession, glob: str) -> DataFrame:
    """Recursive JSON scan (reference os.walk, ingest_votes.py:82-103) —
    the glob replaces the walk; input_file_name() retains provenance."""
    return (
        spark.read.schema(VOTE_SCHEMA)
        .option("multiLine", "true")
        .json(glob)
        .withColumn("src_file", F.input_file_name())
    )


def explode_votes(raw: DataFrame) -> DataFrame:
    """Flatten to one row per (bill, politician, position):

    - skip nominations / missing bill (N3, ingest_votes.py:107-110)
    - explode the position map (N1, :127-147)
    - explode the voter array; parse each element with from_json — the
      literal '"VP"' yields a null-id struct and is dropped (N2, :133-135)
    - composite bill key TYPE+NUMBER-CONGRESS for the bills join
      (J8, :118-119)
    """
    # null-safe nomination guard: a vote file MISSING the category key
    # parses to category=NULL, and a bare `category != 'nomination'`
    # null-propagates to NULL → filter silently drops the whole roll
    # call.  The reference only skips actual nominations.
    valid = raw.filter(
        (F.col("category").isNull() | (F.col("category") != "nomination"))
        & F.col("bill").isNotNull()
    )
    # roll_key: stable per-roll-call identity from the source layout
    # (each roll call is its own <dir>/data.json).  The bare parent dir
    # name is NOT enough context: govtrack roll ids like 'h1' reset
    # every year, and the reference layout is
    # data/{congress}/votes/{year}/{roll}/data.json — keying votes on
    # (politician_id, roll_key) with only the leaf name would silently
    # collapse distinct roll calls from different years into one row.
    # The key anchors on the layout's own 'votes' segment when present
    # ({congress}/votes/{year}/{roll} — root-independent at ANY staging
    # depth), else takes the last four path segments (enough context for
    # 4-deep custom layouts, though a SHALLOWER custom layout then
    # embeds its staging-root dir in the key — re-ingesting from a
    # respelled root duplicates instead of merging; anchor such layouts
    # on their own marker segment), else md5(src_file).  Carried into
    # the votes fact so two same-day roll calls on the same bill —
    # amendment then passage — stay distinct rows (the reference
    # inserts every row; a (politician, bill, date) key would silently
    # collapse them).
    roll_key = F.coalesce(
        F.nullif(
            F.regexp_extract("src_file", r"(?:^|/)([^/]+/votes/[^/]+/[^/]+)/[^/]+$", 1),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract("src_file", r"(?:^|/)((?:[^/]+/){3}[^/]+)/[^/]+$", 1),
            F.lit(""),
        ),
        F.md5("src_file"),
    )
    pos = valid.select(
        "category",
        F.try_to_date("date").alias("date"),
        "bill",
        roll_key.alias("roll_key"),
        F.explode("votes").alias("vote_position", "voters"),
    )
    voters = pos.select(
        "category",
        "date",
        "vote_position",
        "roll_key",
        F.concat(
            F.upper(F.col("bill.type")),
            F.col("bill.number").cast("string"),
            F.lit("-"),
            F.col("bill.congress").cast("string"),
        ).alias("bill_key"),
        F.explode("voters").alias("voter_raw"),
    ).withColumn("voter", F.from_json("voter_raw", VOTER))
    return voters.filter(F.col("voter.id").isNotNull()).select(
        F.col("voter.id").alias("congress_id"),
        "bill_key",
        "date",
        "vote_position",
        F.col("category").alias("vote_category"),
        "roll_key",
    )


def resolve_vote_ids(exploded: DataFrame, politicians: DataFrame, bills: DataFrame) -> DataFrame:
    """Map bioguide→politician_id and bill_key→bill_id via broadcast joins
    (reference builds driver dicts + Series.map — a hand-rolled broadcast
    hash join, ingest_votes.py:33-66, SURVEY J7).  Unknown ids are dropped
    exactly as the reference skips them."""
    pol = F.broadcast(politicians.select("politician_id", "congress_id"))
    bill_keys = F.broadcast(
        bills.select(
            F.col("bill_id"),
            F.concat(
                F.upper("official_bill_number"), F.lit("-"), F.col("congress").cast("string")
            ).alias("bill_key"),
        )
    )
    return (
        exploded.join(pol, "congress_id")
        .join(bill_keys, "bill_key")
        .select(
            "politician_id", "bill_id", "date", "vote_position", "vote_category", "roll_key"
        )
    )
