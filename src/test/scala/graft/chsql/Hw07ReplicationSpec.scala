package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw07.md end-to-end — dictionaries + window +
  * table functions — through ChSession SQL text: the verbatim
  * user_actions/user_emails DDL (hw07.md:10-27), the CREATE DICTIONARY
  * with MIN/MAX LIFETIME and hashed layout (hw07.md:29-43), the
  * numbers()+randUniform insert joined USING (action_id) with a lateral
  * alias reuse (hw07.md:49-77), SYSTEM RELOAD DICTIONARY, and the
  * capture's three SELECTs (dictGet, running sum windowed by action,
  * email-ordered window; hw07.md:80-130). The data is randomized
  * exactly as the homework's (randUniform), so assertions check the
  * INVARIANTS the captures demonstrate: row counts, the dictGet
  * email's construction law, window monotonicity, and the
  * last-frame-equals-group-total law.
  */
class Hw07ReplicationSpec extends SparkSpec {

  test("hw07: dictionary + window + table functions replay") {
    val s = new ChSession(spark)
    // hw07.md:10-27 verbatim (user_actions + the dictionary source)
    s.execute(
      """create table user_actions
        |(
        |    user_id UInt64,
        |    action String,
        |    expense UInt64
        |)
        |engine=MergeTree()
        |order by user_id
        |;
        |create table user_emails
        |(
        |    user_id UInt64,
        |    email String
        |)
        |engine=MergeTree
        |order by user_id;""".stripMargin)
    // hw07.md:29-43 verbatim: attribute list, MIN/MAX lifetime
    s.execute(
      """CREATE DICTIONARY IF NOT EXISTS user_emails_dict
        |(
        |    user_id UInt64,
        |    email String
        |)
        |PRIMARY KEY user_id
        |SOURCE(CLICKHOUSE(DB 'default' TABLE 'user_emails'))
        |LIFETIME(MIN 86400 MAX 126000)
        |LAYOUT(hashed())
        |;""".stripMargin)
    // hw07.md:49-77 verbatim: the source insert (a lateral alias reuse
    // — user_id feeding the email expression), the reload, and the
    // randUniform + numbers() insert joined USING (action_id)
    s.execute(
      """insert into user_emails
        |select
        |    number + 1 as user_id
        |    , 'user' || toString(user_id) || '@mail.com' as email
        |from numbers(10);
        |SYSTEM RELOAD DICTIONARY user_emails_dict;
        |insert into user_actions
        |select user_id, action, expense
        |from (
        |    select
        |        round(randUniform(1, 10)) as user_id
        |        , toInt8(round(randUniform(1, 5))) as action_id
        |        , round(randUniform(1, 100)) as expense
        |    FROM numbers(10000)
        |) t1
        |join (
        |    select
        |        toInt8(number + 1) as action_id
        |        , 'action' || toString(number) as action
        |    from numbers(5)
        |) t2 using (action_id)
        |;""".stripMargin)
    assert(s.sql("select count() as c from user_emails")
      .collect().head.getLong(0) == 10L)
    // round(randUniform(1, 5)) lands in 1..5 which all join; every
    // source row survives the USING join exactly once
    assert(s.sql("select count() as c from user_actions")
      .collect().head.getLong(0) == 10000L)
    // hw07.md:82-84: dictGet email — the capture's LIMIT 5 probe, plus
    // the construction law over ALL user_ids (user<N>@mail.com)
    val probe = s.sql(
      """select user_id, dictGet('user_emails_dict', 'email', user_id)
        |from user_actions
        |limit 5;""".stripMargin).collect()
    assert(probe.length == 5)
    probe.foreach(r =>
      assert(r.getString(1) == s"user${r.getLong(0)}@mail.com", r.toString))
    // hw07.md:86-104: accumulative expense, window partitioned by
    // action ordered by an unordered row_number — the capture shows a
    // monotone running sum; the law is per-action monotonicity in rn
    val acc = s.sql(
      """SELECT
        |    action,
        |    rn,
        |    sum(expense) OVER (PARTITION BY action ORDER BY rn ASC) AS acc
        |FROM
        |(
        |    SELECT
        |        user_id,
        |        action,
        |        expense,
        |        row_number() OVER () AS rn
        |    FROM user_actions
        |)""".stripMargin).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    assert(acc.length == 10000)
    acc.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a._3 <= b._3 },
        "running sum must be monotone within each action")
    }
    // hw07.md:106-130: the email-ordered window — RANGE default frame
    // makes equal emails share one cumulative value (the capture's five
    // user_id=10 rows all read 3411); law: ties share a value, and the
    // window's maximum equals the action's total expense
    val byEmail = s.sql(
      """select user_id
        |    , action
        |    , expense
        |    , sum(expense) over (partition by action order by email) as acc
        |from (
        |        select user_id
        |            , action
        |            , expense
        |            , dictGet('user_emails_dict', 'email', user_id) email
        |        from user_actions
        |    ) t""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // ties (same action, same user_id → same email) share one value
    byEmail.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(rows.map(_._4).distinct.length == 1,
        "equal ORDER BY emails must share one RANGE-frame value")
    }
    val totals = byEmail.groupBy(_._2)
      .map { case (a, rows) => a -> rows.map(_._3).sum }
    byEmail.groupBy(_._2).foreach { case (a, rows) =>
      assert(rows.map(_._4).max == totals(a),
        s"the window maximum must equal action $a's total expense")
    }
  }
}
