package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("src", "dst")
    def show(tag: String, d: org.apache.spark.sql.DataFrame): Unit = {
      println(s"== $tag: " + d.queryExecution.executedPlan.outputPartitioning)
    }
    show("repartition(col) eager ckpt", df.repartition(col("src")).localCheckpoint())
    show("repartition(4, col) eager ckpt", df.repartition(4, col("src")).localCheckpoint())
    show("repartition(col)+dropDup eager ckpt",
      df.repartition(col("src")).dropDuplicates(Seq("src","dst")).localCheckpoint())
    show("repartition(4,col)+dropDup eager ckpt",
      df.repartition(4, col("src")).dropDuplicates(Seq("src","dst")).localCheckpoint())
    val lazyCk = df.repartition(4, col("src")).localCheckpoint(eager = false)
    show("repartition(4, col) LAZY ckpt (pre-action)", lazyCk)
    lazyCk.count()
    show("repartition(4, col) LAZY ckpt (post-action)", lazyCk)
    spark.stop()
  }
}
