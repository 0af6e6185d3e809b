package graft.dictionaries

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** ClickHouse external dictionaries (SURVEY.md §2.12;
  * lectures/lecture_11.md:42-400, homeworks/hw07.md:21-55): named key →
  * attributes tables with `dictGet`-style point lookups.
  *
  * Layouts, mirroring the reference's:
  *  - flat / hashed: [[enrich]] (broadcast hash join — the scalable path,
  *    stays inside codegen) and [[dictGetUdf]] (broadcast-map point lookup
  *    for scalar contexts). Dictionary sizes are bounded by driver/executor
  *    memory, the same constraint the reference's in-RAM layouts have.
  *  - complex_key_hashed (lectures/lecture_11.md:274-286): string and
  *    composite keys — [[register]] takes N key columns and [[dictGetUdf]]
  *    takes N key expressions; keys are normalized (integers widened to
  *    long) on both sides so Int vs Long never misses.
  *  - cache: [[CacheDictionary]] — bounded LRU with fetch-on-miss against
  *    an arbitrary source function, negative-caching misses, hit/miss
  *    counters (`system.dictionaries`-style observability). One cache per
  *    executor, as the reference keeps one per server.
  *
  * `LIFETIME(min,max)` refresh maps to [[reload]] — callers re-register on
  * their refresh schedule.
  */
final class DictionaryRegistry {

  final case class Dict(
      df: DataFrame,
      keyCols: Seq[String],
      broadcastMapByAttr: TrieMap[String, Broadcast[Map[String, Any]]]) {
    def keyCol: String = keyCols.head
  }

  private val dicts = TrieMap.empty[String, Dict]

  /** CREATE DICTIONARY name PRIMARY KEY keyCol SOURCE(df). */
  def register(name: String, df: DataFrame, keyCol: String): Unit =
    register(name, df, Seq(keyCol))

  /** complex_key form: PRIMARY KEY (k1, k2, …) — string keys included. */
  def register(name: String, df: DataFrame, keyCols: Seq[String]): Unit =
    dicts.put(name, Dict(df, keyCols, TrieMap.empty))

  /** SYSTEM RELOAD DICTIONARY (lectures/lecture_11.md): re-read source. */
  def reload(name: String, df: DataFrame): Unit = {
    val d = dict(name)
    d.broadcastMapByAttr.values.foreach(_.unpersist())
    dicts.put(name, Dict(df, d.keyCols, TrieMap.empty))
  }

  def dict(name: String): Dict =
    dicts.getOrElse(name, throw new NoSuchElementException(s"dictionary $name not registered"))

  /** dictGet as a broadcast join: append `attrs` of dictionary `name` to
    * `df`, matching `keyExprs` against the dictionary key columns. Missing
    * keys → null (dictGetOrNull semantics); wrap with coalesce for
    * dictGetOrDefault.
    */
  def enrich(df: DataFrame, name: String, keyExpr: Column,
             attrs: Seq[String], prefix: String = ""): DataFrame =
    enrichComposite(df, name, Seq(keyExpr), attrs, prefix)

  def enrichComposite(df: DataFrame, name: String, keyExprs: Seq[Column],
                      attrs: Seq[String], prefix: String = ""): DataFrame = {
    val d = dict(name)
    require(keyExprs.size == d.keyCols.size,
      s"dictionary $name has ${d.keyCols.size} key columns")
    val sel = d.df.select((d.keyCols ++ attrs).distinct.map(col): _*)
    val keyed = d.keyCols.zipWithIndex.foldLeft(sel) { case (acc, (k, i)) =>
      acc.withColumnRenamed(k, s"__dict_key_$i")
    }
    val renamed = attrs.foldLeft(keyed)((acc, a) =>
      acc.withColumnRenamed(a, prefix + a))
    val cond = keyExprs.zipWithIndex
      .map { case (e, i) => e === col(s"__dict_key_$i") }
      .reduce(_ && _)
    d.keyCols.indices.foldLeft(df.join(broadcast(renamed), cond, "left")) {
      (acc, i) => acc.drop(s"__dict_key_$i")
    }
  }

  /** Normalized key component: integral types widen to Long so an Int key
    * in the query matches a Long key in the dictionary; everything else is
    * its string form. Components join with NUL (absent from real keys).
    */
  private def normRowKey(r: org.apache.spark.sql.Row, n: Int): String = {
    val parts = new Array[String](n)
    var i = 0
    while (i < n) {
      if (r.isNullAt(i)) return null
      parts(i) = r.get(i) match {
        case x: java.lang.Number if x.isInstanceOf[java.lang.Long] ||
          x.isInstanceOf[java.lang.Integer] || x.isInstanceOf[java.lang.Short] ||
          x.isInstanceOf[java.lang.Byte] => x.longValue.toString
        case other => other.toString
      }
      i += 1
    }
    parts.mkString("\u0000")
  }

  private def normKeyExpr(df: DataFrame, keyCols: Seq[String],
                          keyExprs: Seq[Column]): Column = {
    val schema = df.schema
    val comps = keyCols.zip(keyExprs).map { case (k, e) =>
      schema(k).dataType match {
        case LongType | IntegerType | ShortType | ByteType =>
          e.cast("long").cast("string")
        case _ => e.cast("string")
      }
    }
    when(keyExprs.map(_.isNull).reduce(_ || _), lit(null))
      .otherwise(concat_ws("\u0000", comps: _*))
  }

  /** dictGet(name, attr, key…) as a scalar Column (point lookup through a
    * broadcast map). Null for missing keys. Supports numeric, string, and
    * composite keys (pass one Column per key column).
    */
  def dictGetUdf(name: String, attr: String)(keys: Column*): Column = {
    val d = dict(name)
    require(keys.size == d.keyCols.size,
      s"dictionary $name has ${d.keyCols.size} key columns, got ${keys.size}")
    val bc = d.broadcastMapByAttr.getOrElseUpdate(attr, {
      val n = d.keyCols.size
      val rows = d.df.select((d.keyCols :+ attr).map(col): _*).collect()
      val m: Map[String, Any] = rows.iterator
        .map(r => normRowKey(r, n) -> r.get(n))
        .filter(_._1 != null).toMap
      d.df.sparkSession.sparkContext.broadcast(m)
    })
    val fn = udf((k: String) =>
      if (k == null) null
      else bc.value.get(k).orNull.asInstanceOf[String])
    fn(normKeyExpr(d.df, d.keyCols, keys))
  }

  /** dictGetOrDefault. */
  def dictGetOrDefault(name: String, attr: String)(key: Column, default: Column): Column =
    coalesce(dictGetUdf(name, attr)(key), default)
}

object DictionaryRegistry {
  /** Process-wide default registry (the reference's server-level dictionary
    * namespace).
    */
  val global = new DictionaryRegistry
}

/** LAYOUT(CACHE(SIZE_IN_CELLS n)) (lectures/lecture_11.md:274-286): a
  * bounded LRU over a fetch-on-miss `source`, with negative caching
  * (missing keys occupy a cell too, as in the reference) and hit/miss
  * counters. Each executor deserializes its own instance, so each holds an
  * independent cache — the Spark analogue of one cache per server.
  * Wrap in a UDF via [[asUdf]] for column use.
  */
final class CacheDictionary(capacity: Int, source: String => Option[String])
    extends Serializable {

  @transient private lazy val cache =
    new java.util.LinkedHashMap[String, Option[String]](capacity, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[String]]): Boolean =
        size() > capacity
    }
  @transient private lazy val hitCtr = new java.util.concurrent.atomic.AtomicLong
  @transient private lazy val missCtr = new java.util.concurrent.atomic.AtomicLong

  def get(k: String): Option[String] = synchronized {
    val cached = cache.get(k)
    if (cached != null) { hitCtr.incrementAndGet(); cached }
    else {
      missCtr.incrementAndGet()
      val v = source(k)
      cache.put(k, v)
      v
    }
  }

  /** system.dictionaries-style counters (this JVM's cache only). */
  def hits: Long = hitCtr.get
  def misses: Long = missCtr.get
  def size: Int = synchronized { cache.size() }

  def asUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((k: String) => if (k == null) null else get(k).orNull)
}
