package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 60-bit engine-portable hash every sketch/sampling oracle replays:
  * the first 15 hex chars of md5 over the value's string form, read as a
  * base-16 long. Must stay bit-identical to the DuckDB side
  * (`CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)`) —
  * one definition, so a future change cannot drift per call site.
  */
object PortableHash {

  /** 60-bit hash of the column's canonical string form. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
