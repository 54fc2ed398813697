package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Pinned as-of join semantics: at-or-before match, equal-time inclusion,
  * larger-tiebreak-wins on equal right times, null on no prior right row. */
class AsOfSpec extends SparkSpec {
  lazy val s = spark
  import s.implicits._

  private def t(x: String) = Timestamp.valueOf(x)

  test("asOfJoin: at-or-before, equal-time match, ties, and no-match") {
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L), // before any right row
      (1L, t("2024-01-01 12:00:00"), 101L), // exactly at a right row → matches it
      (1L, t("2024-01-01 15:00:00"), 102L), // between right rows → earlier one
      (2L, t("2024-01-01 09:00:00"), 200L)  // key with no right rows at all
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, t("2024-01-01 12:00:00"), 7L),
      (1L, t("2024-01-01 12:00:00"), 9L), // equal-time tie → larger id wins
      (1L, t("2024-01-01 16:00:00"), 11L)
    ).toDF("k", "ts", "rid")

    val got = AsOf.asOfJoin(left, right, "k", "ts", Seq("rid"), "rid")
      .orderBy("lid")
      .select("lid", "asof_rid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))

    assert(got.toSeq == Seq(
      (100L, -1L), // nothing at or before 10:00
      (101L, 9L),  // 12:00 row matches the 12:00 purchases; tie → 9
      (102L, 9L),  // 15:00 sees 12:00 (not 16:00)
      (200L, -1L)  // key 2 has no right rows
    ))
  }

  test("asOfJoin carries multiple value columns consistently") {
    val left = Seq((1L, t("2024-01-01 12:00:00"), 1L)).toDF("k", "ts", "lid")
    val right = Seq((1L, t("2024-01-01 11:00:00"), 5L, "a"))
      .toDF("k", "ts", "rid", "tag")
    val row = AsOf.asOfJoin(left, right, "k", "ts", Seq("rid", "tag"), "rid")
      .select("asof_rid", "asof_tag").first()
    assert(row.getLong(0) == 5L && row.getString(1) == "a")
  }
}
