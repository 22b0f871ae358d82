package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.store.ServiceStore

/** O22 over a live JDBC connection (reference tools/monet2duck.py:39-56
  * reads MonetDB over JDBC-ish DBAPI): spark.read.jdbc against an
  * embedded Derby database through ServiceStore.migrate. The landed
  * count comes from `observe` metrics on the write pass — no
  * destination re-scan.
  */
class JdbcMigrationSpec extends SparkSpec {

  test("spark.read.jdbc -> migrate lands every row, counted on the write") {
    val dbDir = Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$dbDir/src;create=true"
    // Derby writes derby.log into user.dir unless redirected
    System.setProperty("derby.stream.error.file",
      s"$dbDir/derby.log")

    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE entries (service VARCHAR(20), ip VARCHAR(40), path VARCHAR(100), length INT)")
      val ins = conn.prepareStatement(
        "INSERT INTO entries VALUES (?, ?, ?, ?)")
      for (i <- 0 until 12) {
        ins.setString(1, if (i < 7) "blog" else "shop")
        ins.setString(2, s"10.0.0.$i")
        ins.setString(3, s"/p$i")
        ins.setInt(4, i)
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally conn.close()

    val src = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "entries")
      .load()
    assert(src.count() === 12)

    val dst = new ServiceStore(spark, Files.createTempDirectory("graft-wh-jdbc").toString)
    val (expected, landed) = dst.migrate(src, "SERVICE")
    assert(expected === 12L)
    assert(landed === 12L)
    assert(dst.list() === Seq("blog", "shop"))
    assert(dst.read("blog").count() === 7)

    // migrating on top of existing rows still reports only the delta
    val (e2, l2) = dst.migrate(src.limit(3), "SERVICE")
    assert(e2 === 3L && l2 === 3L)
  }
}
