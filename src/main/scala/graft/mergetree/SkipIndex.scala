package graft.mergetree

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BloomPrune
import graft.plans.NativeFunctions

/** ClickHouse data-skipping indexes (`lectures/lecture_08.md:100-170`):
  * `bloom_filter` (exact values), `tokenbf_v1` (alphanumeric tokens of a
  * text column), `set(N)` (distinct values up to a cap) — per data FILE
  * instead of per granule, which is the parquet-native granularity (the
  * row-group minmax level is already Spark's automatic pruning; these
  * cover the membership predicates minmax cannot).
  *
  * The index is a tiny parquet SIDECAR (`_skipidx_<name>/` — the
  * underscore keeps table readers away): one row per data file carrying
  * its summary. Build is one distributed pass over the table grouped by
  * `input_file_name()`; pruning scans only the sidecar (KBs) and hands
  * Spark the surviving file list. A probe that skips 90% of files skips
  * 90% of the I/O — the exact CH mechanic, at object-store scale.
  * Pruning is advisory-correct: false positives cost I/O, never
  * correctness (the real filter still runs on what is read).
  */
object SkipIndex {

  private def sidecar(path: String, name: String) = s"$path/_skipidx_$name"

  /** bloom_filter index: per-file bloom over exact `col` values. */
  def buildBloom(spark: SparkSession, path: String, column: String,
                 name: String, expectedPerFile: Long = 100000L,
                 fpp: Double = 0.01): Unit = {
    NativeFunctions.register(spark)
    val bits = BloomPrune.optimalNumBits(expectedPerFile, fpp)
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(NativeFunctions.bloomAgg(col(column), expectedPerFile, bits).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecar(path, name))
  }

  /** tokenbf_v1 index: per-file bloom over the alphanumeric tokens of a
    * text column — full-text token membership (`hasToken`) pruning.
    */
  def buildTokenBloom(spark: SparkSession, path: String, textColumn: String,
                      name: String, expectedPerFile: Long = 1000000L,
                      fpp: Double = 0.01): Unit = {
    NativeFunctions.register(spark)
    val bits = BloomPrune.optimalNumBits(expectedPerFile, fpp)
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(split(lower(col(textColumn)), "[^a-z0-9]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("file"))
      .agg(NativeFunctions.bloomAgg(col("tok"), expectedPerFile, bits).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecar(path, name))
  }

  /** ngrambf_v1 index: per-file bloom over the character n-grams of a
    * text column — unlike tokenbf this prunes SUBSTRING searches
    * (`LIKE '%needle%'`): a file can only match if every n-gram of the
    * needle is present ([[filesNgramMightContain]] probes all of them).
    */
  def buildNgramBloom(spark: SparkSession, path: String, textColumn: String,
                      name: String, n: Int = 3,
                      expectedPerFile: Long = 1000000L,
                      fpp: Double = 0.01): Unit = {
    require(n >= 1, s"n must be >= 1, got $n")
    NativeFunctions.register(spark)
    val bits = BloomPrune.optimalNumBits(expectedPerFile, fpp)
    val low = lower(col(textColumn))
    spark.read.parquet(path)
      .select(input_file_name().as("file"),
        explode(transform(
          sequence(lit(1), greatest(length(low) - (n - 1), lit(0))),
          i => low.substr(i, lit(n)))).as("g"))
      .groupBy(col("file"))
      .agg(NativeFunctions.bloomAgg(col("g"), expectedPerFile, bits).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecar(path, name))
  }

  /** set(N) index: per-file distinct values, capped — a file whose
    * distinct count exceeds `maxValues` stores NULL (= always matches,
    * CH's "index useless for this part" semantics).
    */
  def buildSet(spark: SparkSession, path: String, column: String,
               name: String, maxValues: Int = 100): Unit = {
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(collect_set(col(column).cast("string")).as("vals"))
      .select(col("file"),
        when(size(col("vals")) <= maxValues, col("vals")).as("vals"))
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecar(path, name))
  }

  /** Files a bloom-family index (bloom_filter / tokenbf) cannot rule out
    * for `value`. The sidecar is one row per data file, so the membership
    * test runs on the driver over collected blobs; the hash matches the
    * build side by construction (same XxHash64 expression, same seed).
    */
  def filesBloomMightContain(spark: SparkSession, path: String, name: String,
                             value: Any): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val hash = new XxHash64(Seq(Literal(value)))
      .eval(null).asInstanceOf[Long]
    spark.read.parquet(sidecar(path, name))
      .select(col("file"), col("bloom")).collect().iterator
      .filter { r =>
        val blob = r.getAs[Array[Byte]](1)
        blob != null && org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(blob))
          .mightContainLong(hash)
      }
      .map(_.getString(0)).toSeq
  }

  /** Files an ngrambf index cannot rule out for a SUBSTRING search:
    * every n-gram of the (lowercased) needle must might-contain.
    * Needles shorter than n cannot use the index (all files survive).
    */
  def filesNgramMightContain(spark: SparkSession, path: String, name: String,
                             needle: String, n: Int = 3): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val low = needle.toLowerCase(java.util.Locale.ROOT)
    val grams = (0 to low.length - n).map(i => low.substring(i, i + n))
    val rows = spark.read.parquet(sidecar(path, name))
      .select(col("file"), col("bloom")).collect().toSeq
    if (grams.isEmpty) return rows.map(_.getString(0))
    val hashes = grams.map(g =>
      new XxHash64(Seq(Literal(g))).eval(null).asInstanceOf[Long])
    rows.iterator.filter { r =>
      val blob = r.getAs[Array[Byte]](1)
      blob == null || {
        val bf = org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(blob))
        hashes.forall(bf.mightContainLong)
      }
    }.map(_.getString(0)).toSeq
  }

  /** Files a set(N) index cannot rule out (NULL summary = always match). */
  def filesSetMightContain(spark: SparkSession, path: String, name: String,
                           value: Any): Seq[String] =
    spark.read.parquet(sidecar(path, name))
      .filter(col("vals").isNull ||
        array_contains(col("vals"), lit(value).cast("string")))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** `EXPLAIN indexes = 1` analogue (lectures/lecture_07.md:198-230's
    * "Parts: 1/10, Granules: 1/10" narrative): given named pruning layers
    * (each a surviving-file list from [[filesBloomMightContain]] /
    * [[filesSetMightContain]] / [[filesNgramMightContain]] or a sort-key
    * minmax pass), report each layer's cumulative Parts: k/n line and
    * return the final surviving set.
    */
  def pruningReport(spark: SparkSession, path: String,
                    layers: Seq[(String, Seq[String])]): (String, Seq[String]) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    val rootPath = fs.makeQualified(root).toString
    val all = Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      // data files only: skip sidecars and other _-prefixed subtrees
      .filter(p => !p.stripPrefix(rootPath).split('/').exists(_.startsWith("_")))
      .toVector
    // normalize away scheme spelling differences (file:/ vs file:///)
    def norm(s: String): String =
      new org.apache.hadoop.fs.Path(s).toUri.getPath
    val total = all.size
    var surviving = all.map(norm).toSet
    val lines = layers.map { case (name, files) =>
      surviving = surviving intersect files.map(norm).toSet
      f"$name%s: Parts ${surviving.size}%d/$total%d"
    }
    (lines.mkString("\n"), surviving.toSeq.sorted)
  }

  /** Read only the surviving files ([[filesBloomMightContain]] /
    * [[filesSetMightContain]]); empty survivors yield an empty frame with
    * the table's schema. Callers still apply their exact filter —
    * pruning is advisory, never a correctness dependency.
    */
  def readPruned(spark: SparkSession, path: String,
                 files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
}
