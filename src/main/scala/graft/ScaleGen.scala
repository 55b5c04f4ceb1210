package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-matched synthetic data generator for scale-stress runs
  * (VERDICT r9 items 1+2).
  *
  * The driver's testdata stops at sf0.1 (~17 MB); SCALING.md's 100 TB
  * claims were extrapolation. This main regenerates all ten tables at
  * any multiple of sf0.1 with the SAME schemas (column names, physical
  * types, micro timestamps — written tz-flagged by Spark, value-
  * identical to the reference's tz-less files under the session's
  * pinned UTC zone) and the same column distributions, measured
  * off `/root/testdata/sf0.01`:
  *
  *   - events: 30 days of Jan-2024 uniform timestamps, users scale
  *     with sf (1500 x mult), value ~ Exp(mean 49.6) rounded to 2dp,
  *     five uniform event types, props = {"k": 0..99} JSON.
  *   - documents: bag-of-words over the observed 30-word vocab plus
  *     the rare "dup" token (~0.1%), 10..99 tokens uniform, lang
  *     en 45.6% / de,es,fr,zh quartered, 20 sources, ~0.16% planted
  *     exact duplicates (the sf0.1 rate).
  *   - embeddings: 64-dim unit vectors, 10 Gaussian clusters
  *     (centroid sigma 2, noise sigma 1 per dim -> element range
  *     ~±0.5 after normalisation, matching the driver data).
  *   - TPC-H-ish tables mirror the observed ranges exactly
  *     (p_retailprice = 900 + (key%1000)/10, Brand#1..25, uniform
  *     flags, 1995..2001 date windows).
  *
  * Determinism: every column is a pure function of (row id, salt)
  * via xxhash64 — no rand(), no partition-order dependence; the same
  * (outDir, mult) always produces byte-identical values regardless of
  * parallelism. That is what lets the skew comparison below attribute
  * time deltas to the DISTRIBUTION, not to sampling noise.
  *
  * `--skew` produces the adversarial hot-key variant at the same row
  * counts (VERDICT item 2): one user owns 30% of events, one source
  * owns 30% of documents, a 12-token boilerplate line is appended to
  * 60% of documents (a near-universal shingle — the worst case for
  * MinHash banding), and 10% of documents are ~0.9-Jaccard near-dups
  * of doc 0 (one giant connected component for dedup_clusters).
  * Bench on uniform vs --skew at the same mult isolates hot-key cost.
  *
  * Usage: runMain graft.ScaleGen <outDir> [multOfSf0.1] [--skew]
  */
object ScaleGen {

  /** Uniform in (0,1), a pure function of (key, salt): stable across
    * partitioning and re-runs, unlike rand(seed). */
  private def u(key: Column, salt: Int): Column =
    (pmod(xxhash64(key, lit(salt)), lit(1000000L)).cast("double") + 0.5) / 1000000.0

  /** Standard normal via Box-Muller on two independent uniforms. */
  private def gauss(key: Column, salt: Int): Column =
    sqrt(lit(-2.0) * log(u(key, salt))) * cos(lit(2.0 * math.Pi) * u(key, salt + 1000003))

  private def pick(key: Column, salt: Int, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*),
      (pmod(xxhash64(key, lit(salt)), lit(vals.size)) + 1).cast("int"))

  /** The document vocabulary observed in the driver data: 30 uniform
    * words plus "dup" at ~1/1024 (0.098%; observed 0.096%). */
  private val Vocab = Seq(
    "join", "hash", "row", "batch", "scan", "customer", "column", "filter",
    "small", "slow", "merge", "order", "vector", "line", "table", "data",
    "agg", "value", "key", "stream", "window", "spark", "a", "group",
    "part", "big", "sort", "query", "fast", "the")

  private val Boilerplate =
    "the fast spark scan reads the big table and the slow query waits"

  private val EventTypes = Seq("signup", "error", "click", "view", "purchase")
  private val Segments =
    Seq("MACHINERY", "BUILDING", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD")
  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PTypes =
    Seq("ECONOMY", "STANDARD", "LARGE", "SMALL", "PROMO", "MEDIUM")
  private val Adjs = Seq("small", "new", "hot", "large", "cold", "red", "blue", "old")
  private val Nouns = Seq("gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod", "widget")

  private val Epoch2024 = 1704067200000000L // 2024-01-01T00:00:00Z in micros
  private val Micros30d = 30L * 86400L * 1000000L
  private val Epoch1995 = 788918400L // 1995-01-01T00:00:00Z in seconds

  /** Output files per table, targeting ~2-3 MB each. A 100 TB table
    * has thousands of row groups, so scan parallelism ≫ cores; a
    * single small local file has ONE row group and serializes all
    * scan-side work (decode, regex, shingle hashing) onto one task no
    * matter the core count. Many small files (plus the session's
    * files.maxPartitionBytes, see GraftSession) reproduce the cluster
    * relationship locally — without this, scale-run growth numbers
    * measure input-split starvation, not plan quality. */
  private def parts(rows: Long, rowsPerFile: Long): Int =
    math.max(2L, math.min(256L, rows / rowsPerFile)).toInt

  def main(args: Array[String]): Unit = {
    val out = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("target/scaledata/sf1")
    val mult = args.filterNot(_.startsWith("--")).lift(1)
      .map(_.toDouble).getOrElse(10.0)
    val skew = args.contains("--skew")

    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Match the driver data's physical timestamp encoding (timestamp[us]).
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    def rows(baseAtSf01: Long): Long = math.max(1L, (baseAtSf01 * mult).toLong)
    val users = rows(1500)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(region(spark), "region")
    write(nation(spark), "nation")
    write(supplier(spark, rows(1000)), "supplier")
    write(customer(spark, rows(15000)), "customer")
    write(part(spark, rows(20000)), "part")
    write(orders(spark, rows(150000), rows(15000)), "orders")
    write(lineitem(spark, rows(600000), rows(150000), rows(20000), rows(1000)),
      "lineitem")
    write(events(spark, rows(100000), users, skew), "events")
    write(documents(spark, rows(5000), skew), "documents")
    // Embeddings grow 4x per 10x of sf in the driver data
    // (500 -> 2000 over sf0.01 -> sf0.1): mult^log10(4).
    write(embeddings(spark, math.max(1L, (2000 * math.pow(mult, 0.60206)).toLong)),
      "embeddings")

    println(s"""{"scalegen": "$out", "mult": $mult, "skew": $skew}""")
    spark.stop()
  }

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST").zipWithIndex
      .map { case (n, i) => (n, i) }.toDF("r_name", "r_regionkey")
      .select(col("r_regionkey").cast("int"), col("r_name"))
  }

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      format_string("NATION_%d", col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def supplier(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    spark.range(0, n, 1, parts(n, 75000)).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      pmod(xxhash64(id, lit(41)), lit(25)).cast("int").as("s_nationkey"),
      round(u(id, 42) * 10000.0, 2).as("s_acctbal"))
  }

  def customer(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    spark.range(0, n, 1, parts(n, 75000)).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      pmod(xxhash64(id, lit(51)), lit(25)).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(id, 52) * 11000.0, 2).as("c_acctbal"),
      pick(id, 53, Segments).as("c_mktsegment"))
  }

  def part(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    spark.range(0, n, 1, parts(n, 75000)).select(
      id.as("p_partkey"),
      concat(pick(id, 61, Adjs), lit(" "), pick(id, 62, Nouns)).as("p_name"),
      format_string("Brand#%d", pmod(xxhash64(id, lit(63)), lit(25)) + 1)
        .as("p_brand"),
      pick(id, 64, PTypes).as("p_type"),
      (pmod(xxhash64(id, lit(65)), lit(50)) + 1).cast("int").as("p_size"),
      round(lit(900.0) + pmod(id, lit(1000)).cast("double") / 10.0, 1)
        .as("p_retailprice"))
  }

  def orders(spark: SparkSession, n: Long, customers: Long): DataFrame = {
    val id = col("id")
    spark.range(0, n, 1, parts(n, 60000)).select(
      id.as("o_orderkey"),
      pmod(xxhash64(id, lit(71)), lit(customers)).as("o_custkey"),
      pick(id, 72, Seq("P", "O", "F")).as("o_orderstatus"),
      round(lit(1000.0) + u(id, 73) * 499000.0, 2).as("o_totalprice"),
      timestamp_seconds(lit(Epoch1995) +
        floor(u(id, 74) * 2404.0).cast("long") * 86400L).as("o_orderdate"),
      pick(id, 75, Priorities).as("o_orderpriority"))
  }

  def lineitem(spark: SparkSession, n: Long, ordersN: Long, partsN: Long,
               suppN: Long): DataFrame = {
    val id = col("id")
    spark.range(0, n, 1, parts(n, 150000)).select(
      pmod(xxhash64(id, lit(81)), lit(ordersN)).as("l_orderkey"),
      pmod(xxhash64(id, lit(82)), lit(partsN)).as("l_partkey"),
      pmod(xxhash64(id, lit(83)), lit(suppN)).as("l_suppkey"),
      (pmod(xxhash64(id, lit(84)), lit(7)) + 1).cast("int").as("l_linenumber"),
      (pmod(xxhash64(id, lit(85)), lit(50)) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u(id, 86) * 104100.0, 2).as("l_extendedprice"),
      round(pmod(xxhash64(id, lit(87)), lit(11)).cast("double") * 0.01, 2)
        .as("l_discount"),
      round(pmod(xxhash64(id, lit(88)), lit(9)).cast("double") * 0.01, 2)
        .as("l_tax"),
      pick(id, 89, Seq("A", "N", "R")).as("l_returnflag"),
      pick(id, 90, Seq("O", "F")).as("l_linestatus"),
      timestamp_seconds(lit(Epoch1995) +
        (floor(u(id, 91) * 2499.0).cast("long") + 1L) * 86400L).as("l_shipdate"))
  }

  /** Events: hot-key mode routes 30% of rows to user 0 — the single
    * hottest key any per-key window/diurnal plan will ever see. */
  def events(spark: SparkSession, n: Long, users: Long, skew: Boolean): DataFrame = {
    val id = col("id")
    val uniformUser = pmod(xxhash64(id, lit(3)), lit(users))
    val userId =
      if (skew) when(u(id, 31) < 0.30, lit(0L)).otherwise(uniformUser)
      else uniformUser
    spark.range(0, n, 1, parts(n, 30000)).select(
      id.as("event_id"),
      timestamp_micros(lit(Epoch2024) +
        floor(u(id, 1) * Micros30d.toDouble).cast("long")).as("ts"),
      userId.as("user_id"),
      pick(id, 4, EventTypes).as("event_type"),
      greatest(round(lit(-49.6) * log(u(id, 2)), 2), lit(0.01)).as("value"),
      format_string("{\"k\": %d}", pmod(xxhash64(id, lit(5)), lit(100)))
        .as("props"))
  }

  /** Documents: bag-of-words with planted exact dups (~0.16%, the
    * sf0.1 rate). Skew mode adds (a) a 30%-hot source, (b) a
    * near-universal boilerplate line on 60% of docs, (c) a 10%
    * near-dup cluster around doc 0 (~5% of tokens mutated). */
  def documents(spark: SparkSession, n: Long, skew: Boolean): DataFrame = {
    val id = col("id")
    // Text seed: exact-dup plants copy one of the first 1000 docs;
    // in skew mode a 10% cluster copies doc 0 (mutated below).
    val clusterDup = skew
    val baseTid = when(u(id, 11) < 0.0016, pmod(id, lit(1000L))).otherwise(id)
    val tid = if (clusterDup)
      when(u(id, 33) < 0.10, lit(0L)).otherwise(baseTid)
    else baseTid
    val len = (pmod(xxhash64(tid, lit(12)), lit(90)) + 10).cast("int")
    val wordAt = (key: Column, i: Column) => {
      val h = pmod(xxhash64(key, i, lit(13)), lit(1024))
      when(h === 1023, lit("dup"))
        .otherwise(element_at(array(Vocab.map(lit): _*),
          (pmod(h, lit(30)) + 1).cast("int")))
    }
    val words = transform(sequence(lit(0), len - 1), i => {
      val base = wordAt(tid, i)
      if (clusterDup)
        // near-dup, not exact: mutate ~5% of token positions per copy
        when(tid =!= id && pmod(xxhash64(id, i, lit(99)), lit(20)) === 0,
          wordAt(id, i + 7919)).otherwise(base)
      else base
    })
    val rawText = array_join(words, " ")
    val text =
      if (skew) when(u(id, 34) < 0.60,
        concat(rawText, lit(" " + Boilerplate))).otherwise(rawText)
      else rawText
    val uniformSrc = concat(lit("src"), pmod(xxhash64(id, lit(15)), lit(20)))
    val source =
      if (skew) when(u(id, 35) < 0.30, lit("src0")).otherwise(uniformSrc)
      else uniformSrc
    val lu = u(id, 14)
    spark.range(0, n, 1, parts(n, 3000)).select(
      id.as("doc_id"),
      text.as("text"),
      when(lu < 0.456, "en").when(lu < 0.592, "de").when(lu < 0.728, "es")
        .when(lu < 0.864, "fr").otherwise("zh").as("lang"),
      source.as("source"),
      length(text).cast("long").as("n_chars"))
  }

  /** Embeddings: 10 Gaussian clusters on the 64-sphere (centroid
    * sigma 2 vs noise sigma 1 -> well-separated, k-means-able),
    * L2-normalised, float32 — matching the driver data's unit norms
    * and ±0.5 element range. */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    val label = pmod(xxhash64(id, lit(21)), lit(10)).cast("int")
    val raw = transform(sequence(lit(0), lit(63)), d =>
      gauss(label.cast("long") * 64L + d, 22) * 2.0 +
        gauss(id * 64L + d, 23))
    spark.range(0, n, 1, parts(n, 2000))
      .select(id.as("vec_id"), raw.as("raw"), label.as("label"))
      .select(
        col("vec_id"),
        transform(col("raw"),
          x => (x / sqrt(aggregate(col("raw"), lit(0.0),
            (acc, v) => acc + v * v))).cast("float")).as("embedding"),
        col("label"))
  }
}
