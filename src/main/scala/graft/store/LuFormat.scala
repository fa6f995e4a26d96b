package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's dual last-updated representation (`DateTimeFormat`
  * enum, `core/store.py:26-30`; converter pair `LU_KEY_ISOFORMAT`,
  * `utils.py:81-103`): stores either keep native datetimes or ISO-8601
  * strings **ceiled to 1 ms** — the ceiling is load-bearing for
  * incremental builds (a sub-ms-newer doc must not compare equal, or
  * `newer_in` misses it; SURVEY §7.5(4)).
  */
object LuFormat {

  /** Ceil a timestamp to the next millisecond (identity when already on
    * a ms boundary) — `to_isoformat_ceil_ms` (`utils.py:81-96`).
    * Integer arithmetic on epoch micros; never floats. */
  def ceilMs(ts: Column): Column =
    timestamp_millis(-floor(-unix_micros(ts) / 1000).cast("long"))

  /** Timestamp → ISO-8601 string with ms precision (the stored form of
    * `DateTimeFormat.ISOFORMAT`). */
  def toIso(ts: Column): Column =
    date_format(ceilMs(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS")

  /** ISO string → timestamp (`isostr_to_dt`, `utils.py:99-103`). */
  def fromIso(s: Column): Column =
    to_timestamp(s, "yyyy-MM-dd'T'HH:mm:ss.SSS")
}
