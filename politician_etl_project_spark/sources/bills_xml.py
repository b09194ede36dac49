"""Billstatus XML pipeline (SURVEY S7, N4; reference
``scripts/update_bills.py:155-256``, ``scripts/ingest_bill_summaries.py:120-150``).

The reference ElementTree-parses fdsys_billstatus.xml per file.  Spark 4
has native XML support: read the files as whole-text and ``from_xml`` the
payload with an explicit nested schema — cosponsor items become an
ArrayType exploded into rows (N4), summaries keep their CDATA text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

COSPONSOR_ITEM = StructType(
    [
        StructField("bioguideId", StringType()),
        StructField("sponsorshipDate", StringType()),
        StructField("isOriginalCosponsor", StringType()),
    ]
)

BILL_XML_SCHEMA = StructType(
    [
        StructField("congress", StringType()),
        StructField("type", StringType()),
        StructField("number", StringType()),
        StructField("title", StringType()),
        StructField("introducedDate", StringType()),
        StructField(
            "sponsors",
            StructType([StructField("item", ArrayType(StructType([StructField("bioguideId", StringType())])))]),
        ),
        StructField("cosponsors", StructType([StructField("item", ArrayType(COSPONSOR_ITEM))])),
        StructField(
            "summaries",
            StructType(
                [
                    StructField(
                        "summary",
                        StructType([StructField("text", StringType())]),
                    )
                ]
            ),
        ),
    ]
)


def read_billstatus(spark: SparkSession, glob: str) -> DataFrame:
    """Whole-file read + from_xml on the <bill> element.  wholetext keeps
    one XML document per row; at scale this is a normal distributed scan
    (files are list-partitioned across executors)."""
    raw = spark.read.text(glob, wholetext=True).withColumn("src_file", F.input_file_name())
    bill_payload = F.regexp_extract("value", r"(?s)<bill>(.*)</bill>", 0)
    return raw.select(
        "src_file",
        F.from_xml(bill_payload, BILL_XML_SCHEMA).alias("bill"),
    )


def extract_bills(parsed: DataFrame) -> DataFrame:
    """Bill header rows (update_bills.py:155-189): official number =
    TYPE+NUMBER, ISO date parse with null coercion."""
    return parsed.select(
        F.concat(F.upper("bill.type"), F.col("bill.number")).alias("official_bill_number"),
        F.col("bill.congress").cast("int").alias("congress"),
        F.col("bill.title").alias("title"),
        F.try_to_date("bill.introducedDate").alias("date_introduced"),
        F.upper("bill.type").alias("bill_type"),
        F.element_at("bill.sponsors.item", 1).getField("bioguideId").alias("sponsor_bioguide"),
        F.col("bill.summaries.summary.text").alias("summary"),
    )


def extract_cosponsors(parsed: DataFrame) -> DataFrame:
    """Cosponsor rows (update_bills.py:191-239, N4): explode the item
    array; boolean parse 'true'/'True' → bool (F16, :231-233); date parse
    with coercion."""
    base = parsed.select(
        F.concat(F.upper("bill.type"), F.col("bill.number")).alias("official_bill_number"),
        F.col("bill.congress").cast("int").alias("congress"),
        F.explode_outer("bill.cosponsors.item").alias("c"),
    )
    return base.filter(F.col("c").isNotNull()).select(
        "official_bill_number",
        "congress",
        F.col("c.bioguideId").alias("congress_id"),
        F.try_to_date("c.sponsorshipDate").alias("sponsorship_date"),
        (F.lower(F.col("c.isOriginalCosponsor")) == "true").alias("is_original_cosponsor"),
    )
