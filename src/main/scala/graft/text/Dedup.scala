package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design: exact dedup is one hash aggregate on a digest (map-side
  * combine, no text shuffled). MinHash/LSH turns all-pairs O(n²) similarity
  * into a band-bucket equi-join: signature computation is per-row scalar work;
  * only (doc_id, band_key) pairs shuffle — at 100 TB the shuffled bytes are
  * ~1% of the corpus. SimHash is per-row; its pair search would bucket on
  * signature bands the same way. Exact Jaccard is reserved for candidate
  * pairs (or bounded scopes), never the full cross product.
  */
object Dedup {

  import TextOps.{h64, h64Sql}

  val NumHashes   = 16
  val NumBands    = 8 // 2 rows per band: high recall for near-dups (J≈0.8 →
  // per-band hit J², any-band ≈ 1-(1-J²)^8 ≈ 0.999); est_jaccard filters the
  // extra low-similarity candidates downstream
  val RowsPerBand: Int = NumHashes / NumBands

  /** Exact dedup groups: digest of normalized text → canonical (min) id +
    * multiplicity. Downstream `keep` = semi-join on (digest, canonical_id). */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(lower(trim(col(text)))).as("text_hash"))
      .agg(min(col(id)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** MinHash signatures over word 3-gram shingles + LSH band keys.
    * Output: id, mh0..mh15, band0..band{NumBands-1}. */
  def minhashSignatures(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("sh", TextOps.wordShingles("w", 3))
    val withMh = (0 until NumHashes).foldLeft(toks) { (d, i) =>
      d.withColumn(s"mh$i",
        expr(s"array_min(transform(sh, x -> ${h64Sql(s"concat('$i:', x)")}))"))
    }
    val withBands = (0 until NumBands).foldLeft(withMh) { (d, b) =>
      val cols = (RowsPerBand * b until RowsPerBand * (b + 1))
        .map(i => s"cast(mh$i AS STRING)").mkString(", ',', ")
      d.withColumn(s"band$b", md5(expr(s"concat($cols)")))
    }
    withBands.drop("w", "sh")
  }

  /** LSH candidate pairs: docs sharing any band bucket, with the MinHash
    * Jaccard estimate (matching hashes / 16). The band equi-join is the only
    * shuffle; signatures travel, not documents.
    *
    * The signature frame is consumed three times (band explode + two sides
    * of the match-count join), so it is persisted here — recomputing it
    * would re-hash the corpus per consumer (measured 10× slowdown). At
    * 100 TB the signature table is ~1% of corpus size and is exactly what
    * you'd materialize. Caller may `.unpersist()` the input afterwards. */
  def minhashCandidates(sig: DataFrame, id: String): DataFrame = {
    val s = sig.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = s.select(col(id), posexplode(
      array((0 until NumBands).map(b => col(s"band$b")): _*)).as(Seq("band_idx", "band_key")))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
    val matches = (0 until NumHashes)
      .map(i => when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(s.as("sa"), col("id_a") === col(s"sa.$id"))
      .join(s.as("sb"), col("id_b") === col(s"sb.$id"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / NumHashes).as("est_jaccard"))
  }

  /** 32-bit SimHash over word unigram hashes: bit j set when the majority of
    * token hashes have bit j set (Charikar, STOC'02; used by crawlers for
    * near-dup web pages). Pure per-row expression work. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), TextOps.tokens(col(text)).as("w"))
      .withColumn("hs", expr(s"transform(w, t -> ${h64Sql("t")})"))
      .withColumn("n", size(col("w")))
    val bits: Column = (0 until 32).map { j =>
      when(expr(s"2 * aggregate(hs, 0L, (acc, h) -> acc + (shiftright(h, $j) & 1)) >= n"),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.withColumn("simhash", bits).drop("w", "hs", "n")
  }

  /** Exact n-gram Jaccard similarity for pairs within a scope column (e.g.
    * same source/bucket): explode distinct shingles, self-join per scope,
    * |A∩B| / |A∪B|. The scope bound keeps the join linear-ish; full-corpus
    * use should feed LSH candidates instead. */
  def ngramJaccard(df: DataFrame, id: String, text: String, scope: String,
                   n: Int, minJaccard: Double): DataFrame = {
    val grams = df
      .select(col(id), col(scope), TextOps.tokens(col(text)).as("w"))
      .withColumn("g", explode(array_distinct(TextOps.wordShingles("w", n))))
      .select(col(id), col(scope), col("g"))
    val sizes = grams.groupBy(col(id)).agg(count(lit(1)).as("n_g"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col(s"a.$scope") === col(s"b.$scope") &&
          col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("na"), col("id_a") === col(s"na.$id"))
      .join(sizes.as("nb"), col("id_b") === col(s"nb.$id"))
      .select(col("id_a"), col("id_b"),
        round(col("n_inter").cast("double") /
          (col("na.n_g") + col("nb.n_g") - col("n_inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
