package graft.schema

import org.apache.spark.sql.types._

/** Declared warehouse schemas.
  *
  * `customers` mirrors the reference's Snowflake DDL
  * (/root/reference/modules/snowflake.py:86-102): 15 columns, lower-case
  * names, NUMBER → LongType, BOOLEAN, STRING, TIMESTAMP. This is the
  * target side of the case-insensitive schema alignment the reference
  * performs via `MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE`
  * (modules/snowflake.py:150).
  */
object Schemas {
  val customers: StructType = StructType(Seq(
    StructField("customerid", LongType),
    StructField("namestyle", BooleanType),
    StructField("title", StringType),
    StructField("firstname", StringType),
    StructField("middlename", StringType),
    StructField("lastname", StringType),
    StructField("suffix", StringType),
    StructField("companyname", StringType),
    StructField("salesperson", StringType),
    StructField("emailaddress", StringType),
    StructField("phone", StringType),
    StructField("passwordhash", StringType),
    StructField("passwordsalt", StringType),
    StructField("rowguid", StringType),
    StructField("modifieddate", TimestampType)))
}
