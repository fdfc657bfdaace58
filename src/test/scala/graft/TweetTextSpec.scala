package graft

import graft.ingest.Ingest
import graft.text.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** North-star composite (SURVEY.md §4): tweet documents → explode → text
  * analysis + dedup, i.e. the reference's social source feeding the
  * training-data operators. */
class TweetTextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tweetDocs = {
    val flat = Seq(
      ("AAPL", "2025-08-01T10:00:00", "the market is up and the stock looks strong today", "u1"),
      ("AAPL", "2025-08-01T10:05:00", "the market is up and the stock looks strong today", "u2"), // exact dup text
      ("AAPL", "2025-08-01T10:10:00", "el mercado esta en la bolsa y es un buen dia para los valores", "u3"),
      ("MSFT", "2025-08-01T11:00:00", "totally unrelated content about kernels and compilers here", "u4"))
      .map { case (s, d, c, u) => (s, d, c, u, java.sql.Timestamp.valueOf("2025-08-01 12:00:00")) }
      .toDF("symbol", "date", "content", "username", "timestamp")
    Ingest.packTweets(flat, cap = 50)
  }

  test("explode → language-ID → quality → exact dedup over tweet content") {
    val rows = Ingest.explodeTweets(tweetDocs)
      .withColumn("tid", monotonically_increasing_id())
    assert(rows.count() == 4)
    assert(rows.filter(col("tweet_ts").isNull).count() == 0)

    val lang = TextOps.languageId(rows, "content", "lang_pred")
      .select("content", "lang_pred").collect()
      .map(r => r.getString(0).take(10) -> r.getString(1)).toMap
    assert(lang("the market") == "en")
    assert(lang("el mercado") == "es")

    val q = TextOps.qualityScore(rows, "content")
    assert(q.filter(col("quality_score").isNull).count() == 0)

    val groups = Dedup.exactGroups(rows, "tid", "content")
    assert(groups.count() == 3) // the duplicated tweet text collapses
    assert(groups.agg(max("n_dups")).head().getLong(0) == 2)

    val stats = TextOps.tokenStats(rows, "content")
    assert(stats.filter(col("ws_tokens") =!= col("bpe_tokens")).count() == 0) // plain words
  }
}
