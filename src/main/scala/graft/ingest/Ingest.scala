package graft.ingest

import graft.schemas.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S8–S12 — source landing. The reference fetches REST/JSON per symbol and
  * appends documents (finnhub/yahoo/fred/google_trends/twitter main.py);
  * network fetch is outside the engine, so the landing contract here is:
  * raw JSON strings in → typed documents out (`from_json` against the
  * catalog schemas), with the per-source quirks (last-row picks, 50-item
  * caps, array packing) as declarative plans.
  */
object Ingest {

  /** Parse raw JSON quote payloads (S8): body + symbol + ingest time →
    * quoteDoc rows. Malformed JSON → NULL struct (coerce semantics). */
  def landQuotes(raw: DataFrame, body: String = "body"): DataFrame =
    raw.select(col("symbol"),
      from_json(col(body), Schemas.quoteData).as("data"),
      col("timestamp"))

  /** Latest-row-per-key pick at the source (S9/S10/S11: history.iloc[-1],
    * series.iloc[-1]): ORDER BY ts DESC LIMIT 1 per key as one aggregate.
    * The ordering key is (ts, payload...) so ts ties resolve to a
    * deterministic row (the repo's determinism contract for order-dependent
    * picks) — re-delivered snapshots with identical timestamps can't flip
    * results between runs or partitionings. */
  def latestPerKey(df: DataFrame, key: String, ts: String): DataFrame = {
    val payload = df.columns.filterNot(c => c == key || c == ts)
    val ordered = ts +: payload.toSeq
    df.groupBy(col(key))
      .agg(max_by(struct(ordered.map(col): _*), struct(ordered.map(col): _*)).as("_r"))
      .select(col(key) +: ordered.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** Tweet packing (S12): bounded per-key enumeration (≤ `cap`) then array
    * packing — collect_list of structs ordered by date, sliced. */
  def packTweets(flat: DataFrame, cap: Int = 50): DataFrame =
    flat.groupBy(col("symbol"))
      .agg(slice(
        array_sort(collect_list(struct(col("date"), col("content"), col("username")))),
        1, cap).as("packed"),
        max(col("timestamp")).as("timestamp"))
      .select(col("symbol"),
        expr("transform(packed, t -> struct(t.content AS content, t.username AS username, t.date AS date))")
          .as("tweets"),
        col("timestamp"))

  /** Explode packed tweet docs back to rows for text analysis (the generator
    * the reference never needed; ours feeds TextOps/Dedup). */
  def explodeTweets(docs: DataFrame): DataFrame =
    docs.select(col("symbol"), col("timestamp").as("ingest_ts"),
        explode(col("tweets")).as("t"))
      .select(col("symbol"), col("ingest_ts"), col("t.content").as("content"),
        col("t.username").as("username"), try_to_timestamp(col("t.date")).as("tweet_ts"))
}
