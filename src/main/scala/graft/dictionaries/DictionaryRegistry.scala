package graft.dictionaries

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse external dictionaries (SURVEY.md §2.12;
  * lectures/lecture_11.md:42-400, homeworks/hw07.md:21-55): named key →
  * attributes tables with `dictGet`-style point lookups.
  *
  * Two lookup paths, mirroring the reference's layouts:
  *  - [[enrich]]: broadcast hash join — the scalable path (flat/hashed
  *    layout). Stays inside codegen; Catalyst plans a BroadcastHashJoin.
  *  - [[dictGetUdf]]: a broadcast `Map` point-lookup UDF — the `dictGet`
  *    scalar surface, for expressions where a join is awkward (e.g. inside
  *    another function call). Dictionary sizes are bounded by driver/
  *    executor memory, the same constraint the reference's in-RAM layouts
  *    have.
  *
  * `LIFETIME(min,max)` refresh maps to [[reload]] — callers re-register on
  * their refresh schedule.
  */
final class DictionaryRegistry {

  final case class Dict(
      df: DataFrame,
      keyCol: String,
      broadcastMapByAttr: TrieMap[String, Broadcast[Map[Long, Any]]])

  private val dicts = TrieMap.empty[String, Dict]

  /** CREATE DICTIONARY name PRIMARY KEY keyCol SOURCE(df). */
  def register(name: String, df: DataFrame, keyCol: String): Unit =
    dicts.put(name, Dict(df, keyCol, TrieMap.empty))

  /** SYSTEM RELOAD DICTIONARY (lectures/lecture_11.md): re-read source. */
  def reload(name: String, df: DataFrame): Unit = {
    val d = dict(name)
    d.broadcastMapByAttr.values.foreach(_.unpersist())
    dicts.put(name, Dict(df, d.keyCol, TrieMap.empty))
  }

  def dict(name: String): Dict =
    dicts.getOrElse(name, throw new NoSuchElementException(s"dictionary $name not registered"))

  /** dictGet as a broadcast join: append `attrs` of dictionary `name` to
    * `df`, matching `keyExpr` against the dictionary key. Missing keys →
    * null (dictGetOrNull semantics); wrap with coalesce for
    * dictGetOrDefault.
    */
  def enrich(df: DataFrame, name: String, keyExpr: Column,
             attrs: Seq[String], prefix: String = ""): DataFrame = {
    val d = dict(name)
    val sel = d.df.select((d.keyCol +: attrs).distinct.map(col): _*)
      .withColumnRenamed(d.keyCol, "__dict_key")
    val renamed = attrs.foldLeft(sel)((acc, a) =>
      acc.withColumnRenamed(a, prefix + a))
    df.join(broadcast(renamed), keyExpr === col("__dict_key"), "left")
      .drop("__dict_key")
  }

  /** dictGet(name, attr, key) as a scalar Column (point lookup through a
    * broadcast map). Null for missing keys.
    */
  def dictGetUdf(name: String, attr: String)(key: Column): Column = {
    val d = dict(name)
    val bc = d.broadcastMapByAttr.getOrElseUpdate(attr, {
      val rows = d.df.select(col(d.keyCol).cast("long"), col(attr)).collect()
      val m: Map[Long, Any] = rows.iterator
        .filter(r => !r.isNullAt(0))
        .map(r => r.getLong(0) -> r.get(1)).toMap
      d.df.sparkSession.sparkContext.broadcast(m)
    })
    val fn = udf((k: java.lang.Long) =>
      if (k == null) null else bc.value.get(k.longValue()).orNull.asInstanceOf[String])
    fn(key.cast("long"))
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
