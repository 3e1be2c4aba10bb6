package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap + table registry for the engine.
  *
  * Hive's query lifecycle (reference: `ql/src/java/org/apache/hadoop/hive/ql/Driver.java:1081`
  * run → compile → execute) collapses into Catalyst here: `Engine.sql` delegates
  * to Spark SQL after registering the warehouse tables as temp views, and
  * `HiveFunctionPack` fills the function-surface gaps
  * (reference: `ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:183-492`).
  *
  * Scale notes (100 TB design):
  *  - all reads are Parquet with full Catalyst pushdown (filters + pruning);
  *  - AQE on: runtime coalescing, skew-join splitting, join-strategy re-plan;
  *  - broadcast threshold left to Spark, but dimension tables are explicitly
  *    broadcast in the query pack where the star schema guarantees small size.
  */
object Engine {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Build a local session configured the way the driver expects. */
  def session(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one warehouse table from an sf directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every warehouse table as a temp view (idempotent) and install
    * the Hive-gap function pack. Returns the session for chaining. */
  def registerAll(spark: SparkSession, dir: String): SparkSession = {
    TableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
    functions.HiveFunctionPack.register(spark)
    spark
  }

  /** SQL entry point — Hive Driver.run analog. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(query)
  }
}
