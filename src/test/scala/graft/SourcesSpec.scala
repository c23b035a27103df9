package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.GraftExtensions
import graft.sources.Tables

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("schema'd csv reader does not run an inference scan") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "researchers.csv")
    Files.writeString(f.toPath, "PID,Name\n167/4350,Ada\n88/6919,Bab\n")
    val schema = StructType(Seq(
      StructField("PID", StringType), StructField("Name", StringType)))
    val df = Tables.csv(spark, f.getAbsolutePath, schema)
    assert(df.schema === schema)
    assert(df.count() === 2)
    assert(df.filter($"PID" === "167/4350").select("Name").as[String].head() === "Ada")
  }

  test("cross-format parity: csv / json-lines / orc round-trip the same rows") {
    // the events slice exercises every awkward round-trip case at
    // once: µs timestamps, doubles, and strings with JSON quotes
    val src = Tables.events(spark, sfDir).limit(200).cache()
    val schema = src.schema
    val base = Files.createTempDirectory("graft_formats").toFile.getAbsolutePath
    src.write.option("header", "true")
      // Java Double.toString round-trips; default CSV formatting may not
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(s"$base/csv")
    src.write
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(s"$base/json")
    src.write.orc(s"$base/orc")
    val expected = src.orderBy("event_id").collect()
    Seq(
      Tables.csv(spark, s"$base/csv", schema),
      Tables.jsonLines(spark, s"$base/json", schema),
      Tables.orc(spark, s"$base/orc", schema)
    ).zip(Seq("csv", "json", "orc")).foreach { case (df, fmt) =>
      assert(df.schema === schema, s"$fmt schema drift")
      assert(df.orderBy("event_id").collect() === expected, s"$fmt row drift")
    }
    src.unpersist()
  }

  test("partitioned parquet sink round-trips and lays out partition dirs") {
    val out = Files.createTempDirectory("graft_sink").toFile.getAbsolutePath
    val df = Seq((1L, "a", 2020), (2L, "b", 2020), (3L, "c", 2021))
      .toDF("id", "v", "year")
    Tables.writePartitioned(df, out, Seq("year"))
    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(new java.io.File(out, "year=2020").exists())
    // idempotent overwrite (the reference's row-wise load is not)
    Tables.writePartitioned(df, out, Seq("year"))
    assert(spark.read.parquet(out).count() === 3)
  }

  test("all driver tables load with their expected columns") {
    val expected = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    expected.foreach { case (t, keyCol) =>
      assert(Tables.table(spark, sfDir, t).columns.contains(keyCol), s"table $t")
    }
    assert(Tables.events(spark, sfDir).schema("ts").dataType === TimestampType)
  }

  test("bucketed tables join with NO shuffle (co-located scan)") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
    // a previous aborted run can leave managed-table files without
    // catalog entries; clear both so saveAsTable's CTAS path succeeds
    def reset(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Seq("b_orders", "b_customer").foreach(reset)
      Tables.writeBucketed(orders, "b_orders", "o_custkey", 4)
      Tables.writeBucketed(customer, "b_customer", "c_custkey", 4)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      // and it returns exactly the plain-join row count
      assert(joined.count() ===
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("GraftExtensions makes the native functions SQL-callable") {
    // a shared test JVM already holds a session, so register live
    // (the withExtensions path shares the same function list)
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT hamming_distance(255L, 15L) AS h,
                rolling_hash('abc') = rolling_hash('abc') AS rh,
                dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                size(shingle_hashes('a b c d', 3)) AS ns,
                size(shingle_hashes_all('a b a b', 2)) AS na,
                size(shingle_hashes('a b a b', 2)) AS nd""").collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getBoolean(1))
    assert(r.getDouble(2) === 11.0)
    assert(r.getInt(3) === 2)
    assert(r.getInt(4) === 3) // positional: ab, ba, ab — duplicates kept
    assert(r.getInt(5) === 2) // deduped sibling

    // the r14 extraction/crawl scalar family from SQL text
    val x = spark.sql(
      """SELECT url_canonicalize('HTTPS://A.COM:443/x/?utm_a=1&q=2#f') AS u,
                html_text('<p>hi <b>there</b></p><script>x()</script>') AS t,
                charset_sniff(encode('plain', 'UTF-8')) AS cs,
                charset_decode(encode('Café', 'ISO-8859-1')) AS cd,
                robots_allowed('User-agent: *\nDisallow: /x\n', '/x/1', 'bot') AS ra,
                robots_allowed('User-agent: *\nDisallow: /x\n', '/y', 'bot') AS rb""")
      .collect().head
    assert(x.getString(0) === "https://a.com/x?q=2")
    assert(x.getString(1) === "hi there")
    assert(x.getString(2) === "utf-8")
    assert(x.getString(3) === "Café")
    assert(!x.getBoolean(4) && x.getBoolean(5))
    // a non-literal agent must fail loudly, not silently misgroup
    // (a column reference — foldable expressions like concat of
    // literals legitimately fold to a constant and are accepted)
    val err = intercept[Exception](spark.sql(
      """SELECT robots_allowed('User-agent: *', '/x', c)
         FROM (SELECT 'bot' AS c)""").collect())
    assert(err.getMessage.contains("agent") || err.getMessage.contains("constant"))

    // sketch aggregates + probes, end-to-end from SQL text
    Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("id", "h")
      .createOrReplaceTempView("sketch_in")
    val s = spark.sql(
      """SELECT size(minhash_agg(h, 16)) AS mh,
                simhash_agg(h) AS sh,
                cms_estimate(cms_agg(h, 4, 64), 10L, 4, 64) AS c10,
                bloom_contains_any(bloom_agg(h, 512, 3), array(10L), 3) AS b10,
                bloom_contains_any(bloom_agg(h, 512, 3), array(99L), 3) AS b99
         FROM sketch_in""").collect().head
    assert(s.getInt(0) === 16)
    assert(s.getLong(2) === 2L) // hash 10 seen twice
    assert(s.getBoolean(3))
    assert(!s.getBoolean(4)) // 1 stray hash vs 512 bits: no FP expected
  }
}
