package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}

/** Row policies (lectures/lecture_18.md:561-608): per-principal row-level
  * prefilters, applied transparently when a table is read "as" a user —
  * the view-with-filter realization SURVEY §2.2 prescribes. Policies on
  * the same table for the same user OR together (ClickHouse permissive
  * policies); users with no policy see everything (as in the reference
  * when no policy names them).
  */
final class RowPolicies {

  /** (table, user) → predicates (OR-combined) */
  private val policies = TrieMap.empty[(String, String), Vector[Column]]

  /** CREATE ROW POLICY ... ON table FOR SELECT USING cond TO user */
  def create(table: String, user: String, using: Column): Unit =
    policies.updateWith((table, user)) {
      case Some(v) => Some(v :+ using)
      case None => Some(Vector(using))
    }

  /** DROP ROW POLICY */
  def drop(table: String, user: String): Unit =
    policies.remove((table, user))

  /** Read `df` (registered under `table`) as `user`: applies the user's
    * policies, OR-combined.
    */
  def readAs(df: DataFrame, table: String, user: String): DataFrame =
    policies.get((table, user)) match {
      case Some(preds) => df.filter(preds.reduce(_ || _))
      case None => df
    }
}
