package graft

import org.apache.spark.sql.SparkSession

/** S2: engine session/config init in ONE place (the reference's
  * config-struct + context bootstrap, borealis-indexer/src/configs.rs:
  * 28-135 — every binary builds its runtime from the same parsed
  * config). Bench/Verify/Health/tests all call [[local]] so the
  * settings that affect semantics (UTC session timezone) and plans
  * (shuffle partitions, AQE) cannot drift between entry points.
  *
  * Scale note: `shuffle partitions = cores` is the local[-N] image of
  * "partitions sized to the executor pool"; on a real cluster the same
  * knob is set to ~2-3x total executor cores and AQE coalesces down.
  */
object SparkSessions {

  /** the one local-mode builder; `extra` layers entry-point-specific
    * settings (e.g. a test warehouse dir) without forking the base
    */
  def local(
      appName: String,
      cores: Int,
      logLevel: String = "WARN",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RocksDB state store as the engine default: streaming state
      // lives off-heap/on-disk instead of executor heap (the at-scale
      // choice), and it is required by transformWithState (KeeperGate)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    functions.ColumnFns.register(s) // engine SQL functions (md5_prefix64)
    s
  }
}
