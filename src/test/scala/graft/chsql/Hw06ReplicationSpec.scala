package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw06.md end-to-end — the corpus's own join
  * acceptance flow over the imdb schema — through ChSession SQL text:
  * the verbatim DDL (FixedString, DEFAULT now()), the groupArray LEFT
  * JOIN under `settings join_use_nulls=1` (hw06.md:118-135), LEFT ANTI
  * reading the right side (hw06.md:137-152), the comma CROSS JOIN count
  * (hw06.md:154-166), LEFT ANY JOIN (hw06.md:168-186), the USING-
  * subquery actor join (hw06.md:188-216), and the NOT-IN anti twin
  * (hw06.md:218-236). The real IMDB TSVs are external data (sweep
  * residue), so a deterministic miniature with the same shape stands
  * in; every assertion mirrors the captured semantics, not the captured
  * row counts.
  */
class Hw06ReplicationSpec extends SparkSpec {

  private def session: ChSession = {
    val s = new ChSession(spark)
    // hw06.md:7-41 verbatim (modulo the trailing show tables)
    s.execute(
      """CREATE DATABASE imdb;
        |use imdb;
        |CREATE TABLE imdb.actors
        |(
        |    id         UInt32,
        |    first_name String,
        |    last_name  String,
        |    gender     FixedString(1)
        |) ENGINE = MergeTree ORDER BY (id, first_name, last_name, gender);
        |CREATE TABLE imdb.genres
        |(
        |    movie_id UInt32,
        |    genre    String
        |) ENGINE = MergeTree ORDER BY (movie_id, genre);
        |CREATE TABLE imdb.movies
        |(
        |    id   UInt32,
        |    name String,
        |    year UInt32,
        |    rank Float32 DEFAULT 0
        |) ENGINE = MergeTree ORDER BY (id, name, year);
        |CREATE TABLE imdb.roles
        |(
        |    actor_id   UInt32,
        |    movie_id   UInt32,
        |    role       String,
        |    created_at DateTime DEFAULT now()
        |) ENGINE = MergeTree ORDER BY (actor_id, movie_id);""".stripMargin)
    // deterministic miniature standing in for the S3 TSVs (external)
    s.execute(
      """INSERT INTO imdb.movies (id, name, year) VALUES
        |  (122529, 'Finaru fuantaj VI', 1994),
        |  (2, 'Express to Terror', 1979),
        |  (3, 'Redskin Raiders, The', 1912),
        |  (4, 'Love, Hate and a Woman', 1921),
        |  (5, 'Secret Boys Club', 1991);
        |INSERT INTO imdb.genres VALUES
        |  (122529, 'Action'), (122529, 'Adventure'), (122529, 'Animation'),
        |  (122529, 'Comedy'), (122529, 'Drama'), (122529, 'Fantasy'),
        |  (122529, 'Horror'), (122529, 'Mystery'), (122529, 'Sci-Fi'),
        |  (122529, 'Thriller'), (122529, 'War'),
        |  (2, 'Action'), (3, 'Drama'), (3, 'Western'), (5, 'Adult');
        |INSERT INTO imdb.actors VALUES
        |  (10, 'Mike', 'Hoffmann', 'M'), (11, 'Pato', 'Hoffmann', 'M'),
        |  (12, 'Stig', 'Hoffmeyer', 'M'), (13, 'Greta', 'Garbo', 'F');
        |INSERT INTO imdb.roles (actor_id, movie_id, role) VALUES
        |  (10, 2, 'lead'), (11, 3, 'lead'), (12, 2, 'support'),
        |  (13, 4, 'lead');""".stripMargin)
    // year filters below use 1979 (the miniature's "2002")
    s
  }

  test("hw06: the 11-genre subquery lookup (hw06.md:94-112)") {
    val s = session
    val rows = s.sql(
      """select *
        |from genres g
        |where movie_id = (
        |	select id
        |	from movies m
        |	where name = 'Finaru fuantaj VI'
        |)""".stripMargin).collect()
    assert(rows.length == 11)
    assert(rows.map(_.getString(1)).sorted.toSeq == Seq("Action",
      "Adventure", "Animation", "Comedy", "Drama", "Fantasy", "Horror",
      "Mystery", "Sci-Fi", "Thriller", "War"))
  }

  test("hw06: groupArray LEFT JOIN under settings join_use_nulls=1 " +
    "avoids [''] arrays (hw06.md:114-135)") {
    val s = session
    val out = s.sql(
      """select
        |    m.name
        |    , m.year
        |    , groupArray(g.genre) as genres
        |from movies m
        |left join genres g on m.id = g.movie_id
        |group by name, year
        |settings join_use_nulls=1""".stripMargin).collect()
      .map(r => r.getString(0) ->
        r.getSeq[String](2).sorted).toMap
    assert(out.size == 5)
    assert(out("Redskin Raiders, The") == Seq("Drama", "Western"))
    // the capture's point: a genre-less movie groups to [] not ['']
    assert(out("Love, Hate and a Woman").isEmpty,
      s"join_use_nulls=1 must keep the miss out of groupArray: $out")
    // and WITHOUT the setting the default '' lands in the array
    val noSetting = s.sql(
      """select m.name, groupArray(g.genre) as genres
        |from movies m left join genres g on m.id = g.movie_id
        |group by name""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(noSetting("Love, Hate and a Woman") == Seq(""),
      "join_use_nulls=0 groups the type default into the array")
  }

  test("hw06: LEFT ANTI JOIN reads the right side as '' (hw06.md:137-152)") {
    val s = session
    val rows = s.sql(
      """select
        |    m.name
        |    , m.year
        |    , g.genre
        |from movies m
        |left anti join genres g on m.id = g.movie_id""".stripMargin)
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("Love, Hate and a Woman"))
    assert(rows.forall(_.getString(2) == ""),
      "anti right side renders the type default, as captured")
  }

  test("hw06: comma CROSS JOIN count (hw06.md:154-166)") {
    val s = session
    val n = s.sql("SELECT count() AS c FROM movies, genres")
      .collect().head.getLong(0)
    assert(n == 5L * 15L)
  }

  test("hw06: LEFT ANY JOIN picks at most one genre (hw06.md:168-186)") {
    val s = session
    val rows = s.sql(
      """select
        |    m.name
        |    , m.year
        |    , g.genre
        |from movies m
        |left ANY join genres g on m.id = g.movie_id""".stripMargin)
      .collect()
    assert(rows.length == 5, "every movie exactly once")
    val byName = rows.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(byName("Love, Hate and a Woman") == "")
    assert(Set("Drama", "Western")(byName("Redskin Raiders, The")))
    assert(byName("Express to Terror") == "Action")
  }

  test("hw06: actors of a year through the USING subquery (hw06.md:188-216)") {
    val s = session
    val rows = s.sql(
      """select a.first_name , a.last_name
        |from actors a
        |join (
        |	select distinct actor_id as id
        |	from roles
        |	where movie_id in (
        |		select id
        |		from movies
        |		where year = 1979
        |	)
        |) t using (id)
        |""".stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(("Mike", "Hoffmann"), ("Stig", "Hoffmeyer")))
  }

  test("hw06: NOT IN matches the anti-join count (hw06.md:218-236)") {
    val s = session
    val notIn = s.sql(
      """select
        |    name
        |from movies m
        |where id not in (select movie_id from genres)""".stripMargin)
      .collect().map(_.getString(0))
    val anti = s.sql(
      "select m.name from movies m left anti join genres g on m.id = g.movie_id")
      .collect().map(_.getString(0))
    assert(notIn.sorted.toSeq == anti.sorted.toSeq &&
      notIn.toSeq == Seq("Love, Hate and a Woman"))
  }
}
