package graft.sources

import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Serving-layer JDBC sink with the reference's delete-by-key + append load.
  *
  * The reference loads its gold table into PostgreSQL by first deleting the
  * rows for the refreshed `date_id` and then appending the new frame
  * (/root/reference/src/gold/dashboard_data/dashboard__north_america_weather.py
  * lines 96–110 + /root/reference/utils/postgres_utils.py `upload_to_postgres`).
  *
  * Spark-first: the delete is one driver-side statement (tiny, keyed), the
  * insert is `df.write.jdbc` which parallelizes across executors — each
  * partition opens its own connection and batches inserts, so the load scales
  * with the cluster rather than a single pandas `to_sql` loop. Callers should
  * `df.coalesce(n)` to match the DB's acceptable connection count.
  *
  * `load` is integration-tested against embedded Derby (LakeSpec): seed →
  * keyed delete → append → read-back.
  */
object JdbcSink {

  /** SQL for the keyed delete that precedes the append (parameterized).
    * The key column is quoted: tables created by `DataFrameWriter.jdbc`
    * carry case-sensitive lower-case column names, which an unquoted
    * identifier would not resolve against (Derby/Postgres fold unquoted
    * identifiers).
    */
  def deleteStatement(schema: String, table: String, keyCol: String): String =
    s"""DELETE FROM $schema.$table WHERE "$keyCol" = ?"""

  /** Delete-by-key then append. `numPartitions` bounds DB connections. */
  def load(
      df: DataFrame,
      url: String,
      schema: String,
      table: String,
      keyCol: String,
      keyValue: String,
      props: Properties,
      numPartitions: Int = 8): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.prepareStatement(deleteStatement(schema, table, keyCol))
      try { st.setString(1, keyValue); st.executeUpdate() }
      finally st.close()
    } finally conn.close()
    df.coalesce(numPartitions)
      .write
      .mode("append")
      .jdbc(url, s"$schema.$table", props)
  }
}
