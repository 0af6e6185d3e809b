package graft.misc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dictionaries.{CacheDictionary, DictionaryRegistry}

class DictionarySpec extends SparkSpec {
  import spark.implicits._

  test("dictGetUdf: numeric key (flat/hashed layout)") {
    val reg = new DictionaryRegistry
    reg.register("n1", Seq((1L, "one"), (2L, "two")).toDF("k", "v"), "k")
    val got = Seq(1L, 2L, 3L).toDF("k")
      .select(reg.dictGetUdf("n1", "v")($"k").as("v"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("one"), Some("two"), None))
  }

  test("dictGetUdf: int query key matches long dictionary key (widening)") {
    val reg = new DictionaryRegistry
    reg.register("n2", Seq((10L, "x")).toDF("k", "v"), "k")
    val got = Seq(10).toDF("k") // IntegerType
      .select(reg.dictGetUdf("n2", "v")($"k")).as[String].head()
    assert(got == "x")
  }

  test("dictGetUdf: string key (complex_key_hashed, lecture_11.md:274-286)") {
    val reg = new DictionaryRegistry
    reg.register("cc", Seq(("DE", "Germany"), ("FR", "France")).toDF("code", "name"), "code")
    val got = Seq("FR", "??").toDF("code")
      .select(reg.dictGetUdf("cc", "name")($"code"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("France"), None))
  }

  test("dictGetUdf + enrichComposite: composite (string, long) key") {
    val reg = new DictionaryRegistry
    val dict = Seq(("eu", 1L, "de-1"), ("eu", 2L, "de-2"), ("us", 1L, "us-1"))
      .toDF("region", "shard", "label")
    reg.register("topo", dict, Seq("region", "shard"))

    val probe = Seq(("eu", 2L), ("us", 1L), ("us", 9L)).toDF("region", "shard")
    val viaUdf = probe
      .select(reg.dictGetUdf("topo", "label")($"region", $"shard"))
      .as[Option[String]].collect().toSeq
    assert(viaUdf == Seq(Some("de-2"), Some("us-1"), None))

    val viaJoin = reg.enrichComposite(probe, "topo",
        Seq($"region", $"shard"), Seq("label"))
      .orderBy($"region", $"shard")
      .select($"label").as[Option[String]].collect().toSeq
    assert(viaJoin == Seq(Some("de-2"), Some("us-1"), None))
  }

  test("cache layout: fetch-on-miss, hit/miss counters, LRU eviction") {
    var fetches = 0
    val cd = new CacheDictionary(2, k => {
      fetches += 1
      if (k.startsWith("k")) Some(s"v$k") else None
    })
    assert(cd.get("k1").contains("vk1") && cd.misses == 1 && cd.hits == 0)
    assert(cd.get("k1").contains("vk1") && cd.hits == 1)   // cache hit
    assert(cd.get("miss").isEmpty && cd.misses == 2)
    assert(cd.get("miss").isEmpty && cd.hits == 2)          // negative cached
    assert(fetches == 2)
    // capacity 2: k1 is LRU after touching miss → k2 evicts k1
    assert(cd.get("k2").contains("vk2"))
    assert(cd.size == 2)
    assert(cd.get("k1").contains("vk1") && fetches == 4)    // refetched

    // column surface
    val got = Seq("k1", "zzz").toDF("k")
      .select(cd.asUdf($"k").as("v")).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("vk1"), None))
  }
}
