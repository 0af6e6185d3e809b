package graft.chsql

import graft.SparkSpec

/** Replays homeworks/hw03.md end-to-end through ChSession SQL text —
  * the richest all-local homework: the commented menu DDL with
  * Decimal32/LowCardinality(Nullable)/DEFAULT now() modifiers
  * (hw03.md:14-27), the CRUD cycle (hw03.md:29-37), schema evolution
  * (DROP COLUMN + ADD COLUMN ... AFTER, hw03.md:39-42), the NYPL
  * sample-dataset DDL + CSVWithNames load + the 3-way denormalizing
  * CTAS (hw03.md:44-167; the real dataset is external network data —
  * `docs/sweep_residue.md` — so a small synthetic CSV drives the same
  * load path), and the partition lifecycle on a toYYYYMM-partitioned
  * table: 12 monthly parts, DETACH → ATTACH → DROP with system.parts
  * active-flag captures (hw03.md:186-283).
  */
class Hw03ReplicationSpec extends SparkSpec {

  test("hw03: menu DDL + CRUD + schema evolution replay") {
    val s = new ChSession(spark)
    s.execute("create database homework")
    // hw03.md:14-27 verbatim (comments, Decimal32(2),
    // LowCardinality(Nullable(String)), DEFAULT now(), trailing comma)
    s.execute(
      """CREATE TABLE homework.menu
        |(
        |    `id`          UInt16                           COMMENT 'айди блюда, 16 битов выбрано тк вряд ли у нас будет больше 65535 блюд',
        |    `name`        String                           COMMENT 'название блюда',
        |    `description` String                           COMMENT 'описание блюда',
        |    `price`       Decimal32(2)                     COMMENT 'цена блюда',
        |    `category`    LowCardinality(Nullable(String)) COMMENT 'категория блюда',
        |    `updated_at`  DateTime DEFAULT now()           COMMENT 'время обновления записи',
        |    `created_at`  DateTime                         COMMENT 'время создания записи',
        |)
        |ENGINE = MergeTree()
        |ORDER BY (id,updated_at)""".stripMargin)
    // hw03.md:31-36: the CRUD cycle — partial-column INSERT (updated_at
    // takes DEFAULT now(), category NULL), point SELECT, UPDATE, DELETE
    s.execute(
      """INSERT INTO homework.menu (id, name, description, price, created_at)
        |VALUES (1, 'Рагу', 'Рагу', '520.20',  now())""".stripMargin)
    val row = s.sql("SELECT * FROM homework.menu  WHERE id = 1").collect()
    assert(row.length == 1)
    val r0 = row.head
    assert(r0.getAs[Any]("name").toString == "Рагу")
    assert(r0.getAs[java.math.BigDecimal]("price")
      .compareTo(new java.math.BigDecimal("520.20")) == 0)
    assert(r0.isNullAt(r0.fieldIndex("category")), "category defaults NULL")
    assert(!r0.isNullAt(r0.fieldIndex("updated_at")),
      "updated_at must take DEFAULT now()")
    s.execute(
      "ALTER TABLE homework.menu  UPDATE category = 'рагу' WHERE id = 1")
    assert(s.sql("SELECT category FROM homework.menu WHERE id = 1")
      .collect().head.getString(0) == "рагу")
    s.execute("ALTER TABLE homework.menu  DELETE WHERE id = 1")
    assert(s.sql("SELECT count() AS c FROM homework.menu")
      .collect().head.getLong(0) == 0L)
    // hw03.md:40-41: drop a column, add one positioned AFTER price
    s.execute("ALTER TABLE homework.menu DROP COLUMN category")
    s.execute(
      "ALTER TABLE homework.menu ADD COLUMN calories Decimal32(2) AFTER price")
    val cols = s.sql("SELECT * FROM homework.menu").columns.toSeq
    assert(!cols.contains("category"))
    assert(cols.indexOf("calories") == cols.indexOf("price") + 1,
      s"calories must sit right after price: $cols")
  }

  test("hw03: NYPL dataset DDL + CSVWithNames load + denormalizing CTAS") {
    val s = new ChSession(spark)
    // hw03.md:46-106 verbatim DDL (the four sample-dataset tables)
    s.execute(
      """CREATE TABLE dish
        |(
        |    id UInt32,
        |    name String,
        |    description String,
        |    menus_appeared UInt32,
        |    times_appeared Int32,
        |    first_appeared UInt16,
        |    last_appeared UInt16,
        |    lowest_price Decimal64(3),
        |    highest_price Decimal64(3)
        |) ENGINE = MergeTree ORDER BY id""".stripMargin)
    s.execute(
      """CREATE TABLE menu
        |(
        |    id UInt32,
        |    name String,
        |    sponsor String,
        |    event String,
        |    venue String,
        |    place String,
        |    physical_description String,
        |    occasion String,
        |    notes String,
        |    call_number String,
        |    keywords String,
        |    language String,
        |    date String,
        |    location String,
        |    location_type String,
        |    currency String,
        |    currency_symbol String,
        |    status String,
        |    page_count UInt16,
        |    dish_count UInt16
        |) ENGINE = MergeTree ORDER BY id""".stripMargin)
    s.execute(
      """CREATE TABLE menu_page
        |(
        |    id UInt32,
        |    menu_id UInt32,
        |    page_number UInt16,
        |    image_id String,
        |    full_height UInt16,
        |    full_width UInt16,
        |    uuid UUID
        |) ENGINE = MergeTree ORDER BY id""".stripMargin)
    s.execute(
      """CREATE TABLE menu_item
        |(
        |    id UInt32,
        |    menu_page_id UInt32,
        |    price Decimal64(3),
        |    high_price Decimal64(3),
        |    dish_id UInt32,
        |    created_at DateTime,
        |    updated_at DateTime,
        |    xpos Float64,
        |    ypos Float64
        |) ENGINE = MergeTree ORDER BY id""".stripMargin)
    // hw03.md:110-114: the clickhouse-client CSVWithNames load — the
    // real archive is network data; a synthetic slice drives the same
    // `INSERT INTO t FORMAT CSVWithNames < file` path (2 dishes, 2
    // menus, 3 pages, 4 items; one item's page points at a menu-less
    // page so the inner 3-way join provably drops it)
    val dir = java.nio.file.Files.createTempDirectory("hw03csv")
    def write(name: String, text: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, text.getBytes("UTF-8"))
      p.toString
    }
    val dishCsv = write("Dish.csv",
      """id,name,description,menus_appeared,times_appeared,first_appeared,last_appeared,lowest_price,highest_price
        |1,Consomme printaniere royal,,8,9,1897,1927,0.2,0.4
        |2,Chicken gumbo,,111,117,1895,1960,0.1,0.8
        |""".stripMargin)
    val menuCsv = write("Menu.csv",
      """id,name,sponsor,event,venue,place,physical_description,occasion,notes,call_number,keywords,language,date,location,location_type,currency,currency_symbol,status,page_count,dish_count
        |12463,,HOTEL EASTMAN,BREAKFAST,COMMERCIAL,"HOT SPRINGS, AR",,,,1900-2822,,,,Hotel Eastman,,,,complete,2,67
        |12464,,REPUBLICAN HOUSE,DINNER,COMMERCIAL,"MILWAUKEE, WI",,,,1900-2825,,,,Republican House,,,,complete,2,34
        |""".stripMargin)
    val pageCsv = write("MenuPage.csv",
      """id,menu_id,page_number,image_id,full_height,full_width,uuid
        |119,12463,1,1603595,7230,5428,510d47e4-2955-a3d9-e040-e00a18064a99
        |120,12463,2,1603596,7230,5428,510d47e4-2956-a3d9-e040-e00a18064a99
        |121,99999,1,1603597,7230,5428,510d47e4-2957-a3d9-e040-e00a18064a99
        |""".stripMargin)
    val itemCsv = write("MenuItem.csv",
      """id,menu_page_id,price,high_price,dish_id,created_at,updated_at,xpos,ypos
        |1,119,0.4,0,1,2011-03-28 15:00:44,2011-04-19 04:33:15,0.11,0.2
        |2,119,0.6,0,2,2011-03-28 15:01:13,2011-04-19 19:10:04,0.44,0.3
        |3,120,0.4,0,2,2011-03-28 15:01:40,2011-04-19 19:07:50,0.35,0.4
        |4,121,0.2,0,1,2011-03-28 15:01:51,2011-04-19 19:07:02,0.28,0.5
        |""".stripMargin)
    s.execute(s"INSERT INTO dish FROM INFILE '$dishCsv' FORMAT CSVWithNames")
    s.execute(s"INSERT INTO menu FROM INFILE '$menuCsv' FORMAT CSVWithNames")
    s.execute(
      s"INSERT INTO menu_page FROM INFILE '$pageCsv' FORMAT CSVWithNames")
    s.execute(
      s"INSERT INTO menu_item FROM INFILE '$itemCsv' FORMAT CSVWithNames")
    assert(s.sql("SELECT count() AS c FROM menu_item")
      .collect().head.getLong(0) == 4L)
    // hw03.md:122-166 verbatim: the denormalizing CTAS (3-way join)
    s.execute(
      """CREATE TABLE menu_item_denorm
        |ENGINE = MergeTree ORDER BY (dish_name, created_at)
        |AS SELECT
        |    price,
        |    high_price,
        |    created_at,
        |    updated_at,
        |    xpos,
        |    ypos,
        |    dish.id AS dish_id,
        |    dish.name AS dish_name,
        |    dish.description AS dish_description,
        |    dish.menus_appeared AS dish_menus_appeared,
        |    dish.times_appeared AS dish_times_appeared,
        |    dish.first_appeared AS dish_first_appeared,
        |    dish.last_appeared AS dish_last_appeared,
        |    dish.lowest_price AS dish_lowest_price,
        |    dish.highest_price AS dish_highest_price,
        |    menu.id AS menu_id,
        |    menu.name AS menu_name,
        |    menu.sponsor AS menu_sponsor,
        |    menu.event AS menu_event,
        |    menu.venue AS menu_venue,
        |    menu.place AS menu_place,
        |    menu.physical_description AS menu_physical_description,
        |    menu.occasion AS menu_occasion,
        |    menu.notes AS menu_notes,
        |    menu.call_number AS menu_call_number,
        |    menu.keywords AS menu_keywords,
        |    menu.language AS menu_language,
        |    menu.date AS menu_date,
        |    menu.location AS menu_location,
        |    menu.location_type AS menu_location_type,
        |    menu.currency AS menu_currency,
        |    menu.currency_symbol AS menu_currency_symbol,
        |    menu.status AS menu_status,
        |    menu.page_count AS menu_page_count,
        |    menu.dish_count AS menu_dish_count
        |FROM menu_item
        |    JOIN dish ON menu_item.dish_id = dish.id
        |    JOIN menu_page ON menu_item.menu_page_id = menu_page.id
        |    JOIN menu ON menu_page.menu_id = menu.id""".stripMargin)
    // items 1-3 join through pages 119/120 → menu 12463; item 4's page
    // 121 points at menu 99999 (absent) → dropped by the inner join
    val denorm = s.sql(
      "SELECT count() AS c FROM menu_item_denorm").collect().head.getLong(0)
    assert(denorm == 3L, s"denorm row count: $denorm")
    val sponsors = s.sql(
      "SELECT DISTINCT menu_sponsor FROM menu_item_denorm")
      .collect().map(_.getString(0)).toSeq
    assert(sponsors == Seq("HOTEL EASTMAN"))
  }

  test("hw03: partition lifecycle — 12 monthly parts, DETACH / ATTACH / " +
    "DROP PARTITION with system.parts captures") {
    val s = new ChSession(spark)
    // hw03.md:192-201 verbatim (DEFAULT 42, toYYYYMM partitioning)
    s.execute("DROP TABLE IF EXISTS tbl")
    s.execute(
      """CREATE TABLE tbl
        |(
        |    id UInt64 DEFAULT 42,
        |    dt DateTime COMMENT 'Some comment',
        |)
        |ENGINE MergeTree()
        |ORDER BY id
        |PARTITION BY toYYYYMM(dt)""".stripMargin)
    s.execute(
      """INSERT INTO tbl
        |select
        |    number,
        |    toDateTime('2023-10-01 00:00:00') + number * 315360,
        |FROM numbers(100)""".stripMargin)
    // hw03.md capture: partitions 202310..202409 (12 months)
    val partitions = s.sql(
      """SELECT
        |    database,
        |    table,
        |    partition,
        |    name
        |FROM
        |    system.parts
        |WHERE
        |    table = 'tbl'""".stripMargin)
      .collect().map(_.getAs[String]("partition")).distinct.sorted
    assert(partitions.length == 12 &&
      partitions.head == "202310" && partitions.last == "202409",
      s"partitions: ${partitions.toSeq}")
    val before = s.sql("SELECT count() AS c FROM tbl")
      .collect().head.getLong(0)
    assert(before == 100L)
    val inOct = s.sql(
      "SELECT count() AS c FROM tbl WHERE toYYYYMM(dt) = 202310")
      .collect().head.getLong(0)
    // hw03.md:255: DETACH hides the partition's rows; active=0 in parts
    s.execute("ALTER TABLE tbl DETACH PARTITION 202310")
    assert(s.sql("SELECT count() AS c FROM tbl")
      .collect().head.getLong(0) == before - inOct)
    val activeAfterDetach = s.sql(
      """SELECT count() AS c FROM system.parts
        |WHERE table = 'tbl' and partition = '202310' and active = 1""".stripMargin)
      .collect().head.getLong(0)
    assert(activeAfterDetach == 0L, "detached partition must not be active")
    // hw03.md:268: ATTACH brings it back
    s.execute("ALTER TABLE tbl ATTACH PARTITION 202310")
    assert(s.sql("SELECT count() AS c FROM tbl")
      .collect().head.getLong(0) == before)
    // hw03.md:281: DROP removes it for good
    s.execute("ALTER TABLE tbl DROP PARTITION 202310")
    assert(s.sql("SELECT count() AS c FROM tbl")
      .collect().head.getLong(0) == before - inOct)
    assert(s.sql(
      """SELECT count() AS c FROM system.parts
        |WHERE table = 'tbl' and partition = '202310' and active = 1""".stripMargin)
      .collect().head.getLong(0) == 0L)
  }
}
