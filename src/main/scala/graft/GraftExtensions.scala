package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) to get
  * every [[graft.functions.GraftFunctions]] SQL function in each new
  * session with no imports — the deployment path for SQL-only users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
