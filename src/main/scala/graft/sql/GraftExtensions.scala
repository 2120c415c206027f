package graft.sql

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.sql.GraftExtensions` — the one-line session
  * wiring the reference documents for its own extension class
  * (`IcebergSparkSessionExtensions` in /root/reference's README). Injects
  * the SQL statement parser (`ALTER TABLE … SET GEOMETRY FIELDS`,
  * `CALL graft.system.*`) and the view-substitution resolution rule (the
  * reference's `ResolveViews`). The optimizer rules + ST_ function
  * registry are installed lazily by every read path (`Geo.install`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(session => GraftViewSubstitution(session))
  }
}
