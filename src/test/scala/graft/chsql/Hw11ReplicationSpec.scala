package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw11.md end-to-end — mutations + partition
  * manipulation over user_activity — through ChSession SQL text: the
  * verbatim DDL (LowCardinality, PARTITION BY toYYYYMMDD), the verbatim
  * scalar-WITH + JSONExtractString + randUniform insert (hw11.md:38-44),
  * the system.parts inventory (hw11.md:46-55: five daily partitions),
  * the UPDATE mutation + system.mutations log (hw11.md:99-125), and
  * DROP PARTITION + the post-drop checks (hw11.md:127-160).
  */
class Hw11ReplicationSpec extends SparkSpec {

  test("hw11: user_activity mutations and partition drop, verbatim flow") {
    val s = new ChSession(spark)
    // hw11.md:28-44 verbatim
    s.execute(
      """create table user_activity
        |(
        |    user_id         UInt32                  comment 'идентификатор пользователя',
        |    activity_type   LowCardinality(String)  comment 'тип активности',
        |    activity_date   DateTime                comment 'дата и время активности'
        |)
        |engine=MergeTree
        |partition by toYYYYMMDD(activity_date)
        |order by user_id;
        |insert into user_activity
        |with '{"1": "login", "2": "logout", "3": "purchase"}' as activity_type_cte
        |select
        |    floor(randUniform(1, 11)) as user_id
        |    , JSONExtractString(activity_type_cte, toString(floor(randUniform(1, 4)))) as activity_type
        |    , toDate('2024-01-01') + interval (floor(number/1000)) hours as activity_date
        |from numbers(1, 100000);""".stripMargin)
    assert(s.sql("select count() as c from user_activity")
      .collect().head.getLong(0) == 100000L)
    // the randomized activity_type draws only the three JSON values
    val types = s.sql("select distinct activity_type from user_activity")
      .collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("login", "logout", "purchase")), types)
    // hw11.md:46-55: five daily partitions (hours 0..100 span Jan 1-5)
    val parts = s.sql(
      """select
        |    table,
        |    partition,
        |    groupArray(name) AS parts
        |from system.parts
        |where table = 'user_activity'
        |group by all
        |order by partition""".stripMargin).collect()
    assert(parts.map(_.getString(1)).toSeq == Seq("20240101", "20240102",
      "20240103", "20240104", "20240105"),
      s"partition inventory: ${parts.map(_.getString(1)).toSeq}")
    // hw11.md:99-101: the UPDATE mutation
    s.execute("alter table user_activity UPDATE activity_type = " +
      "'some new type' WHERE user_id = 1")
    val mut = s.sql(
      """select command, is_done from system.mutations
        |where table = 'user_activity'""".stripMargin).collect()
    assert(mut.exists(r => r.getString(0).contains("some new type") &&
      r.getAs[Number](1).longValue == 1L), s"mutation log: ${mut.toSeq}")
    // hw11.md:108-115: the check read
    val updated = s.sql(
      """select *
        |from user_activity
        |where user_id = 1
        |    and toDate(activity_date) = '2024-01-01'
        |limit 1""".stripMargin).collect()
    assert(updated.nonEmpty && updated.head.getString(1) == "some new type")
    // every user_id=1 row mutated; no other user touched
    assert(s.sql("select count() as c from user_activity where user_id = 1 " +
      "and activity_type <> 'some new type'").collect().head.getLong(0) == 0L)
    assert(s.sql("select count() as c from user_activity where user_id <> 1 " +
      "and activity_type = 'some new type'").collect().head.getLong(0) == 0L)
    // hw11.md:127-135: drop the first day's partition
    val before = s.sql("select count() as c from user_activity")
      .collect().head.getLong(0)
    val day1 = s.sql("select count() as c from user_activity " +
      "where toYYYYMMDD(activity_date) = 20240101")
      .collect().head.getLong(0)
    s.execute("ALTER TABLE user_activity DROP PARTITION 20240101")
    val check = s.sql(
      """select *
        |from user_activity
        |where user_id = 1
        |    and toDate(activity_date) = '2024-01-01'
        |limit 1""".stripMargin).collect()
    assert(check.isEmpty, "hw11's post-drop read must return 0 rows")
    assert(s.sql("select count() as c from user_activity")
      .collect().head.getLong(0) == before - day1)
    // hw11.md:139-160: the partition is gone from the active inventory
    val after = s.sql(
      """select partition from system.parts
        |where table = 'user_activity' and partition = '20240101'
        |  and active = 1""".stripMargin).collect()
    assert(after.isEmpty, s"dropped partition still active: ${after.toSeq}")
  }
}
