package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ENGINE=Set / ENGINE=Join / ENGINE=Memory (SURVEY.md §2.1;
  * lectures/lecture_09.md:208-496): pre-built in-RAM structures for `IN`
  * filters and `joinGet` point lookups.
  */
object SetJoinEngines {

  /** ENGINE=Set: a prepared set for `WHERE x IN set_table`
    * (lectures/lecture_09.md:426-496). [[filterIn]] is the scalable path
    * (broadcast left-semi join — Catalyst turns it into a broadcast hash
    * semi, nothing shuffles); [[contains]] is the scalar surface.
    */
  final class SetEngine private (keys: DataFrame, keyCol: String,
                                 bc: Broadcast[Set[Long]]) {

    def filterIn(df: DataFrame, expr: Column): DataFrame =
      df.join(broadcast(keys.select(col(keyCol).as("__set_k")).distinct()),
          expr === col("__set_k"), "left_semi")

    def filterNotIn(df: DataFrame, expr: Column): DataFrame =
      df.join(broadcast(keys.select(col(keyCol).as("__set_k")).distinct()),
          expr === col("__set_k"), "left_anti")

    def contains(expr: Column): Column = {
      val b = bc
      udf((k: java.lang.Long) => k != null && b.value.contains(k.longValue()))
        .apply(expr.cast("long"))
    }
  }

  object SetEngine {
    def build(df: DataFrame, keyCol: String): SetEngine = {
      val set = df.select(col(keyCol).cast("long")).na.drop()
        .distinct().collect().map(_.getLong(0)).toSet
      new SetEngine(df, keyCol, df.sparkSession.sparkContext.broadcast(set))
    }
  }

  /** ENGINE=Join(ANY, LEFT, key) + joinGet(tbl, 'attr', key)
    * (lectures/lecture_09.md:236-283): a persistent prepared hash table.
    * Backed by the dictionary registry — identical machinery (broadcast
    * map for the scalar lookup, broadcast join for the relational form).
    */
  final class JoinEngine(df: DataFrame, keyCol: String) {
    private val reg = new graft.dictionaries.DictionaryRegistry
    reg.register("join_engine", df, keyCol)

    /** joinGet('t', 'attr', key) — first-match (ANY) semantics. */
    def joinGet(attr: String)(key: Column): Column = reg.dictGetUdf("join_engine", attr)(key)

    /** LEFT ANY JOIN through the prepared table. */
    def joinWith(left: DataFrame, keyExpr: Column, attrs: Seq[String]): DataFrame =
      reg.enrich(left, "join_engine", keyExpr, attrs)
  }
}
