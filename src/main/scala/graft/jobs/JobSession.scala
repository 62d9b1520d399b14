package graft.jobs

import org.apache.spark.sql.SparkSession

/** Session bootstrap shared by the `graft.jobs` spark-submit mains.
  *
  * Under spark-submit the master/deploy config comes from the launcher;
  * standalone (tests, bare `java -cp`) it falls back to local[*]. A main
  * must NOT stop a session it joined rather than created (the test JVM
  * shares one session across suites), so `release` only stops sessions
  * this object created.
  */
object JobSession {

  def get(appName: String): SparkSession = synchronized {
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    existing.getOrElse {
      created = true
      val b = SparkSession.builder()
        .appName(appName)
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.sql.session.timeZone", "UTC")
      if (sys.props.get("spark.master").isEmpty) {
        b.master("local[*]").config("spark.sql.shuffle.partitions",
          Runtime.getRuntime.availableProcessors().toString)
      }
      b.getOrCreate()
    }
  }

  private var created = false

  def release(spark: SparkSession): Unit = synchronized {
    if (created) { spark.stop(); created = false }
  }
}
