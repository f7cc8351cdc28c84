package org.apache.spark.sql

import org.apache.spark.sql.jdbc.JdbcDialect

/** Test-only accessor for `private[sql]` dialect resolution: lets a spec
  * look up the stock dialect registered for a JDBC url so it can be
  * temporarily swapped (JdbcSourceSpec's join-pushdown opt-in) and
  * restored. Lives in the test classpath only. */
object GraftTestBridge {
  def dialectFor(url: String): JdbcDialect =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url)
}
